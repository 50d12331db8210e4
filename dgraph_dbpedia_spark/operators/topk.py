"""Top-k values per group — the reference's flagship operator (W1+J2).

Reference semantics (DbpediaDgraphSparkApp.scala:121-137, SPARK.md:195-222):
count occurrences of a value per group, rank per group by count
descending with a *lexicographic tie-break on the value* for
determinism, keep rank <= k, then use the survivors as a left-semi-join
dimension to filter the fact table.

Scale shape: the count is a partial+final hash aggregate (map-side
combine — one shuffle over (group, value), cardinality = #distinct
pairs, tiny relative to the fact table). The window runs over the
*aggregated* frame, so its sort is proportional to #distinct pairs, not
#rows. The resulting dimension is k * #groups rows — always broadcast
it; the semi-join then touches each fact row exactly once with no
fact-side shuffle. That plan survives a 1000-executor / 100 TB scale-up:
the only full-data movement is the initial scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def top_k_per_group(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    k: int,
    count_col: str = "count",
) -> DataFrame:
    """Return ``group_cols + [value_col, count_col]`` for the k most
    frequent values per group; deterministic tie-break = value asc."""
    counts = df.groupBy(*group_cols, value_col).agg(F.count(F.lit(1)).alias(count_col))
    w = Window.partitionBy(*group_cols).orderBy(F.col(count_col).desc(), F.col(value_col).asc())
    return (
        counts.withColumn("__rank", F.row_number().over(w))
        .where(F.col("__rank") <= k)
        .drop("__rank")
    )


def filter_to_top_k(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    k: int,
    dim: DataFrame | None = None,
) -> DataFrame:
    """Keep only rows whose value is in the group's top-k (J2 semi-join).

    ``dim`` lets callers reuse / remap a precomputed top-k dimension (the
    reference remaps ``en-*`` langs onto the ``en`` top-k before this
    join, DbpediaDgraphSparkApp.scala:133-135).
    """
    if dim is None:
        dim = top_k_per_group(df, group_cols, value_col, k)
    dim = dim.select(*group_cols, value_col)
    return df.join(F.broadcast(dim), [*group_cols, value_col], "left_semi")
