"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query (top-k sources per language with
deterministic tie-break + semi-join filter) on sf0.001.
``queries()`` — one named callable per implemented operator from
SURVEY.md §2 (and the training-data-pipeline extensions).
``oracle_sql()`` — DuckDB-equivalent SQL for the correctness gate.

Column names are aligned between Spark and SQL on purpose — the driver
hashes values after sorting columns by name.
"""

from __future__ import annotations

from collections.abc import Callable
from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dgraph_dbpedia_spark.operators.topk import filter_to_top_k, top_k_per_group
from dgraph_dbpedia_spark.operators.majority import (
    filter_to_majority,
    majority_value_per_group,
)
from dgraph_dbpedia_spark.operators.stats import stats_table
from dgraph_dbpedia_spark.functions.rdf import (
    blank_node,
    extract_datatype,
    geo_to_geojson,
    remove_lang_tags,
)


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    # the driver's testdata stores TIMESTAMP(NANOS); Spark has no nanos
    # type, so read them as long regardless of the caller's session conf
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# --------------------------------------------------------------------------
# flagship


def entry(spark: SparkSession) -> DataFrame:
    """Top-3 sources per language over documents (W1: count + window
    rank with lexicographic tie-break), sf0.001."""
    return _q_topk_sources(spark, "/root/testdata/sf0.001")


# --------------------------------------------------------------------------
# reference-surface queries (SURVEY §2)


def _q_topk_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return top_k_per_group(docs, ["lang"], "source", 3, count_col="cnt")


def _q_topk_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return filter_to_top_k(docs, ["lang"], "source", 3).select(
        "doc_id", "lang", "source"
    )


def _q_majority_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = _t(spark, sf_dir, "events")
    return majority_value_per_group(events, ["event_type"], "props", count_col="cnt")


def _q_majority_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = _t(spark, sf_dir, "events")
    return filter_to_majority(events, ["event_type"], "props").select(
        "event_id", "event_type", "props"
    )


def _q_group_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n")
    )


def _q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
            "sum_disc_price"
        ),
        F.count(F.lit(1)).alias("count_order"),
    )


def _q_distinct_custkeys(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    return orders.groupBy("o_orderpriority").agg(
        F.countDistinct("o_custkey").alias("n_cust")
    )


def _q_join_nation_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region")
    return nation.join(
        F.broadcast(region), nation.n_regionkey == region.r_regionkey
    ).select("n_nationkey", "n_name", "r_name")


def _q_stats_fold(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    frames = {
        f"src{i}": docs.where(F.col("source") == f"src{i}") for i in range(3)
    }
    return stats_table(frames, "lang")


def _q_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    a = cust.where(F.col("c_mktsegment") == "BUILDING").select("c_custkey", "c_name")
    b = cust.where(F.col("c_acctbal") > 0).select("c_custkey", "c_name")
    return a.unionByName(b).distinct()


def _q_blank_node(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    uri = F.concat(F.lit("<doc:"), F.col("doc_id").cast("string"), F.lit(">"))
    return docs.select("doc_id", blank_node(uri).alias("bn"))


def _q_remove_lang_tags(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    o = F.concat(F.lit('"'), F.col("text"), F.lit('"@'), F.col("lang"))
    return docs.select("doc_id", remove_lang_tags(o).alias("o"))


def _q_extract_datatype(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = _t(spark, sf_dir, "events")
    o = F.when(
        F.col("event_type") == "click",
        F.concat(F.lit("<http://x/"), F.col("user_id").cast("string"), F.lit(">")),
    ).otherwise(
        F.concat(
            F.lit('"'),
            F.col("value").cast("string"),
            F.lit('"^^<http://www.w3.org/2001/XMLSchema#double>'),
        )
    )
    df = events.select("event_id", o.alias("o"))
    v, t = extract_datatype(F.col("o"))
    return df.select("event_id", v.alias("v"), t.alias("t"))


def _q_geo_geojson(spark: SparkSession, sf_dir: str) -> DataFrame:
    # rows-only check: JSON float formatting differs across engines
    events = _t(spark, sf_dir, "events")
    point = F.concat(
        F.lit('"'),
        F.round(F.col("value"), 3).cast("string"),
        F.lit(" "),
        F.round(F.col("value") * 2, 3).cast("string"),
        F.lit('"'),
    )
    return events.select("event_id", geo_to_geojson(point).alias("geojson"))


# --------------------------------------------------------------------------
# training-data-pipeline extensions


def _q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return docs.groupBy(F.md5("text").alias("fp")).agg(
        F.min("doc_id").alias("doc_id")
    )


def _q_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.size(F.split(F.trim(F.col("text")), r"\s+")).alias("n_tokens"),
        F.length("text").alias("n_chars_actual"),
    )


def _q_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings")
    query = emb.orderBy("vec_id").limit(1).select(
        F.col("embedding").cast("array<double>").alias("q")
    )
    cand = emb.where(F.col("vec_id") > 0).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("e")
    )
    joined = cand.crossJoin(F.broadcast(query))
    dot = F.aggregate(
        F.zip_with("e", "q", lambda a, b: a * b), F.lit(0.0), lambda acc, x: acc + x
    )
    norm = lambda c: F.sqrt(
        F.aggregate(c, F.lit(0.0), lambda acc, x: acc + x * x)
    )
    sim = (dot / (norm(F.col("e")) * norm(F.col("q")))).alias("sim")
    scored = joined.select("vec_id", F.round(sim, 4).alias("sim"))
    return scored.orderBy(F.col("sim").desc(), "vec_id").limit(5)


QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "topk_sources_per_lang": _q_topk_sources,
    "topk_semi_join": _q_topk_semi_join,
    "majority_props_per_event_type": _q_majority_props,
    "majority_semi_join": _q_majority_semi_join,
    "group_counts": _q_group_counts,
    "pricing_summary": _q_pricing_summary,
    "distinct_custkeys_per_priority": _q_distinct_custkeys,
    "join_nation_region": _q_join_nation_region,
    "stats_full_outer_fold": _q_stats_fold,
    "union_distinct": _q_union_distinct,
    "blank_node_rewrite": _q_blank_node,
    "remove_lang_tags": _q_remove_lang_tags,
    "extract_datatype": _q_extract_datatype,
    "geo_geojson": _q_geo_geojson,
    "dedup_exact": _q_dedup_exact,
    "token_count": _q_token_count,
    "cosine_topk": _q_cosine_topk,
}


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return {
        "topk_sources_per_lang": """
            SELECT lang, source, cnt FROM (
                SELECT lang, source, count(*) AS cnt,
                       row_number() OVER (
                           PARTITION BY lang
                           ORDER BY count(*) DESC, source ASC) AS rn
                FROM documents GROUP BY lang, source) t
            WHERE rn <= 3
        """,
        "topk_semi_join": """
            SELECT d.doc_id, d.lang, d.source
            FROM documents d
            SEMI JOIN (
                SELECT lang, source FROM (
                    SELECT lang, source,
                           row_number() OVER (
                               PARTITION BY lang
                               ORDER BY count(*) DESC, source ASC) AS rn
                    FROM documents GROUP BY lang, source) t
                WHERE rn <= 3) k
            ON d.lang = k.lang AND d.source = k.source
        """,
        "majority_props_per_event_type": """
            SELECT event_type, props, cnt FROM (
                SELECT event_type, props, count(*) AS cnt,
                       row_number() OVER (
                           PARTITION BY event_type
                           ORDER BY count(*) DESC, props ASC) AS rn
                FROM events GROUP BY event_type, props) t
            WHERE rn = 1
        """,
        "majority_semi_join": """
            SELECT e.event_id, e.event_type, e.props
            FROM events e
            SEMI JOIN (
                SELECT event_type, props FROM (
                    SELECT event_type, props,
                           row_number() OVER (
                               PARTITION BY event_type
                               ORDER BY count(*) DESC, props ASC) AS rn
                    FROM events GROUP BY event_type, props) t
                WHERE rn = 1) k
            ON e.event_type = k.event_type AND e.props = k.props
        """,
        "group_counts": """
            SELECT l_returnflag, l_linestatus, count(*) AS n
            FROM lineitem GROUP BY l_returnflag, l_linestatus
        """,
        "pricing_summary": """
            SELECT l_returnflag, l_linestatus,
                   round(sum(l_quantity), 2) AS sum_qty,
                   round(sum(l_extendedprice), 2) AS sum_base_price,
                   round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
                   count(*) AS count_order
            FROM lineitem GROUP BY l_returnflag, l_linestatus
        """,
        "distinct_custkeys_per_priority": """
            SELECT o_orderpriority, count(DISTINCT o_custkey) AS n_cust
            FROM orders GROUP BY o_orderpriority
        """,
        "join_nation_region": """
            SELECT n_nationkey, n_name, r_name
            FROM nation JOIN region ON n_regionkey = r_regionkey
        """,
        "stats_full_outer_fold": """
            SELECT coalesce(a.lang, b.lang, c.lang) AS lang,
                   coalesce(a.src0, 0) AS src0,
                   coalesce(b.src1, 0) AS src1,
                   coalesce(c.src2, 0) AS src2
            FROM      (SELECT lang, count(*) AS src0 FROM documents WHERE source = 'src0' GROUP BY lang) a
            FULL JOIN (SELECT lang, count(*) AS src1 FROM documents WHERE source = 'src1' GROUP BY lang) b USING (lang)
            FULL JOIN (SELECT lang, count(*) AS src2 FROM documents WHERE source = 'src2' GROUP BY lang) c
              ON coalesce(a.lang, b.lang) = c.lang
        """,
        "union_distinct": """
            SELECT c_custkey, c_name FROM customer WHERE c_mktsegment = 'BUILDING'
            UNION
            SELECT c_custkey, c_name FROM customer WHERE c_acctbal > 0
        """,
        "blank_node_rewrite": """
            SELECT doc_id, '_:' || md5('<doc:' || doc_id::VARCHAR || '>') AS bn
            FROM documents
        """,
        "remove_lang_tags": """
            SELECT doc_id,
                   regexp_replace('"' || text || '"@' || lang, '@[a-z]+$', '') AS o
            FROM documents
        """,
        "extract_datatype": """
            WITH src AS (
                SELECT event_id,
                       CASE WHEN event_type = 'click'
                            THEN '<http://x/' || user_id::VARCHAR || '>'
                            ELSE '"' || value::VARCHAR || '"^^<http://www.w3.org/2001/XMLSchema#double>'
                       END AS o
                FROM events)
            SELECT event_id,
                   CASE WHEN starts_with(o, '<') THEN o
                        WHEN contains(o, '^^')
                        THEN o[1:length(o) - length(list_extract(string_split(o, '^^'), -1)) - 2]
                        ELSE o END AS v,
                   CASE WHEN starts_with(o, '<') THEN '<uri>'
                        WHEN contains(o, '^^')
                        THEN list_extract(string_split(o, '^^'), -1)
                        ELSE NULL END AS t
            FROM src
        """,
        # geo_geojson: no oracle (JSON float formatting is engine-specific)
        "dedup_exact": """
            SELECT md5(text) AS fp, min(doc_id) AS doc_id
            FROM documents GROUP BY md5(text)
        """,
        "token_count": """
            SELECT doc_id,
                   len(regexp_split_to_array(trim(text), '\\s+')) AS n_tokens,
                   length(text) AS n_chars_actual
            FROM documents
        """,
        "cosine_topk": """
            WITH q AS (
                SELECT embedding::DOUBLE[] AS q FROM embeddings
                ORDER BY vec_id LIMIT 1),
            scored AS (
                SELECT vec_id,
                       round(
                           list_dot_product(embedding::DOUBLE[], q) /
                           (sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) *
                            sqrt(list_dot_product(q, q))), 4) AS sim
                FROM embeddings, q WHERE vec_id > 0)
            SELECT vec_id, sim FROM scored ORDER BY sim DESC, vec_id LIMIT 5
        """,
    }
