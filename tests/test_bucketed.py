"""Bucketed tables must elide the join shuffle: the whole point is
that repeated joins on the bucket key read co-located data with NO
Exchange in the physical plan."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dgraph_dbpedia_spark.sources.bucketed import read_bucketed, write_bucketed


@pytest.fixture(scope="module")
def bucketed_pair(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("bucketed")
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    stats = docs.select("doc_id", F.length("text").alias("n"))
    write_bucketed(
        docs.select("doc_id", "lang", "source"),
        "t_docs_b", 8, ["doc_id"], sort_cols=["doc_id"],
        path=str(root / "docs"),
    )
    write_bucketed(
        stats, "t_stats_b", 8, ["doc_id"], sort_cols=["doc_id"],
        path=str(root / "stats"),
    )
    yield "t_docs_b", "t_stats_b"
    spark.sql("DROP TABLE IF EXISTS t_docs_b")
    spark.sql("DROP TABLE IF EXISTS t_stats_b")


def test_bucketed_join_has_no_exchange(spark, bucketed_pair):
    a, b = bucketed_pair
    left, right = read_bucketed(spark, a), read_bucketed(spark, b)
    # force the join path (a broadcast would trivially avoid exchanges
    # without exercising bucketing)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = left.join(right, "doc_id")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        # and it is a real sort-merge join over the bucketed scans
        assert "SortMergeJoin" in plan
        # correctness unchanged vs the plain-parquet join
        n = joined.count()
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    want = docs.select("doc_id").join(
        docs.select("doc_id", F.length("text").alias("n")), "doc_id"
    ).count()
    assert n == want


def test_bucketed_groupby_has_no_exchange(spark, bucketed_pair):
    """Aggregation on the bucket key also rides the bucket layout."""
    a, _ = bucketed_pair
    df = read_bucketed(spark, a).groupBy("doc_id").count()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
    assert df.count() == 500


def test_plain_parquet_join_does_shuffle(spark, bucketed_pair):
    """Control: the same join without bucketing DOES exchange — proving
    the elision above is the bucketing, not some other rewrite."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = docs.select("doc_id", "lang").join(
            docs.select("doc_id", F.length("text").alias("n")), "doc_id"
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" in plan
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
