"""Deterministic stratified sampling (extension surface).

Training-data curation needs per-stratum quotas (per language, per
source, per quality bucket) that are reproducible across runs and
engines — `df.sampleBy` is neither (seeded RNG over partition order)
nor exact. This takes the hash-ranking approach used by
`hash_sample` (operators/textclean.py) per stratum: rank rows inside
each stratum by the cross-engine hash of their id and keep the first
``n_per_stratum``. Exactly-n per stratum (fewer if the stratum is
smaller), stable under repartitioning, and replayable in any engine
with md5.

Scale shape: one shuffle on the strata columns; the window is a
rank-truncation so state per stratum is O(1) beyond the sort. For
very hot strata, note the sort is within-stratum — salt only helps if
a single stratum exceeds a task's spill budget, at which point
``fast=True`` (xxhash64) also removes the md5 cost.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from dgraph_dbpedia_spark.functions.hashing import hash64


def stratified_sample(
    df: DataFrame,
    strata_cols: Sequence[str],
    n_per_stratum: int,
    id_col: str,
    fast: bool = False,
) -> DataFrame:
    """Keep the ``n_per_stratum`` rows with the smallest
    ``hash(id_col)`` inside each stratum (ties broken by id). Columns
    pass through unchanged."""
    # pick a rank column name that cannot clobber caller data (ADVICE
    # r5: a fixed "__rn" silently dropped an input column of that name)
    rn = "__rn"
    while rn in df.columns:
        rn = "_" + rn
    h = hash64(F.col(id_col).cast("string"), fast=fast)
    w = Window.partitionBy(*strata_cols).orderBy(h.asc(), F.col(id_col).asc())
    return (
        df.withColumn(rn, F.row_number().over(w))
        .where(F.col(rn) <= n_per_stratum)
        .drop(rn)
    )
