"""Bucketed Parquet tables: co-located, shuffle-free repeated joins.

At 100 TB the dominant recurring cost of a curation pipeline is the
shuffle on the join key (doc_id / vec_id / subject URI) repeated by
every downstream job. Hive-style bucketing amortizes it to ZERO: write
once with ``bucketBy(n, key)`` (one shuffle at write time), and every
subsequent equi-join or aggregation on the key reads co-located buckets
with NO Exchange in the plan — Spark's bucketing-aware scan reports the
hash-partitioning to Catalyst, which then elides the shuffle on both
sides (verified in tests/test_bucketed.py by asserting the joined plan
contains no Exchange operator).

Bucketed tables must go through the session catalog (``saveAsTable`` —
plain ``save`` silently drops bucket metadata); pass ``path`` to keep
the data external to the warehouse dir.

Sizing: pick ``n_buckets`` so one bucket of the LARGEST co-bucketed
table is ~128-512 MB; all tables joined together must share the same
``n_buckets`` and bucket columns or the shuffle elision only applies to
one side.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    n_buckets: int,
    bucket_cols: Sequence[str],
    sort_cols: Sequence[str] = (),
    path: str | None = None,
    fmt: str = "parquet",
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as a bucketed (and optionally per-bucket sorted)
    catalog table. ``sort_cols`` additionally makes each bucket file
    sorted — joins on (bucket_cols) can then run sort-merge without
    either the exchange OR the sort."""
    writer = df.write.format(fmt).mode(mode).bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    if path is not None:
        writer = writer.option("path", path)
    writer.saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table (the catalog carries the bucket spec; a
    plain ``spark.read.parquet(path)`` would forget it)."""
    return spark.table(table)
