"""Dataset statistics — counts, distinct counts, per-group pivots.

Reference behavior: per-dataset triple/node/predicate counts
(DbpediaToParquetSparkApp.scala:98-106, DbpediaDgraphSparkApp.scala:154-158),
a per-language stats table assembled by folding full-outer joins on
``lang`` over one count-frame per dataset (J4, :157), an ``en-*`` rollup
row appended via groupBy().sum() + union (A4+U2, :163-171).

Scale notes: exact ``distinct().count()`` on an unbounded column is a
full shuffle of that column; ``approx_count_distinct`` (HyperLogLog++,
map-side combinable) is offered for the 100 TB path. The fold of
full-outer joins is fine here because each input is already one row per
language (#langs ~ 125): every join is broadcastable. We keep the fold
for parity but also provide the idiomatic single-shuffle alternative
(union + pivot).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def dataset_counts(df: DataFrame, approx: bool = False) -> dict[str, int]:
    """triples / distinct nodes / distinct predicates (A5+A6)."""
    if approx:
        row = df.agg(
            F.count(F.lit(1)).alias("triples"),
            F.approx_count_distinct("s").alias("nodes"),
            F.approx_count_distinct("p").alias("predicates"),
        ).collect()[0]
    else:
        row = df.agg(
            F.count(F.lit(1)).alias("triples"),
            F.countDistinct("s").alias("nodes"),
            F.countDistinct("p").alias("predicates"),
        ).collect()[0]
    return {"triples": row["triples"], "nodes": row["nodes"], "predicates": row["predicates"]}


def counts_per_group(df: DataFrame, group_col: str, count_name: str) -> DataFrame:
    """``groupBy(group).count()`` with a dataset-specific column name so
    frames can be joined side by side (A3, DbpediaDgraphSparkApp.scala:156)."""
    return df.groupBy(group_col).agg(F.count(F.lit(1)).alias(count_name))


def stats_table(frames: dict[str, DataFrame], group_col: str = "lang") -> DataFrame:
    """Fold full-outer joins on ``group_col`` over per-dataset count
    frames (J4, DbpediaDgraphSparkApp.scala:157). Inputs are one row per
    group, so each join stays broadcast-sized regardless of fact scale."""
    counted = [counts_per_group(df, group_col, name) for name, df in frames.items()]

    def outer(a: DataFrame, b: DataFrame) -> DataFrame:
        # null-SAFE key equality: a USING full-outer never matches NULL
        # keys, so a NULL group present in two datasets would yield two
        # half-empty rows here while stats_table_pivot's groupBy merges
        # them — the two documented-equivalent forms must agree. The
        # right key is RENAMED before the expression join: per-dataset
        # count frames routinely derive from ONE source frame, and
        # attribute references (a[col] / b[col]) into shared lineage
        # trip Spark's ambiguous-self-join check
        rk = "__rk"
        while rk in a.columns or rk in b.columns:
            rk = "_" + rk
        bb = b.withColumnRenamed(group_col, rk)
        keep = [c for c in bb.columns if c != rk]
        return (
            a.join(bb, F.col(group_col).eqNullSafe(F.col(rk)), "full_outer")
            .select(
                F.coalesce(F.col(group_col), F.col(rk)).alias(group_col),
                *[F.col(c) for c in a.columns if c != group_col],
                *[F.col(c) for c in keep],
            )
        )

    joined = reduce(outer, counted)
    return joined.na.fill(0)


def stats_table_pivot(frames: dict[str, DataFrame], group_col: str = "lang") -> DataFrame:
    """Single-shuffle alternative to the join fold: tag + union + pivot.
    Preferred at scale when the number of datasets grows."""
    tagged = [
        df.select(F.col(group_col), F.lit(name).alias("__dataset"))
        for name, df in frames.items()
    ]
    unioned = reduce(DataFrame.unionByName, tagged)
    return (
        unioned.groupBy(group_col)
        .pivot("__dataset", list(frames.keys()))
        .agg(F.count(F.lit(1)))
        .na.fill(0)
    )


def rollup_group(df: DataFrame, group_col: str, pred, label: str) -> DataFrame:
    """Aggregate all rows matching ``pred`` into a single labelled row and
    append it (A4+U2, DbpediaDgraphSparkApp.scala:163-171) — the
    reference's ``en-*`` rollup."""
    dtypes = dict(df.dtypes)
    num_cols = [
        c
        for c, t in df.dtypes
        if c != group_col
        and (t in ("bigint", "int", "smallint", "tinyint", "double", "float")
             or t.startswith("decimal"))
    ]
    # WIDEN the base columns to the sums' natural types (sum(int) is
    # bigint, sum(float) is double, sum(decimal(p,s)) is
    # decimal(p+10,s)) — casting the sums DOWN would overflow (ANSI
    # ArithmeticException, or a silent wrap/NULL) on any rollup
    # exceeding the source type's range; widening is lossless. groupBy
    # on the literal label — NOT a global agg — so a predicate matching
    # zero rows appends NOTHING instead of a phantom all-NULL row
    rolled = (
        df.where(pred(F.col(group_col)))
        .groupBy(F.lit(label).alias(group_col))
        .agg(*[F.sum(c).alias(c) for c in num_cols])
        .select(group_col, *num_cols)
    )
    rolled_types = dict(rolled.dtypes)
    base = df
    for c in num_cols:
        if dtypes[c] != rolled_types[c]:
            base = base.withColumn(c, F.col(c).cast(rolled_types[c]))
    return base.unionByName(rolled)


def per_lang_stats_tables(
    frames: dict[str, DataFrame], group_col: str = "lang"
) -> tuple[DataFrame, DataFrame]:
    """The reference flagship's per-language x per-dataset count tables
    (DbpediaDgraphSparkApp.scala:155-179): the J4 full-outer fold over
    per-dataset counts, split into

    - the MAIN table: all non-``en-*`` languages plus ONE ``en-*``
      rollup row (groupBy().sum() over the pseudo-language rows, U2),
      ordered by language;
    - the EN-STAR table: the individual ``en-*`` rows, ordered.

    Both inputs to the union come from one cached fold, so the fact
    frames are scanned once per dataset regardless of how many tables
    are printed."""
    from dgraph_dbpedia_spark.operators.cachectl import tag_persisted

    tbl = stats_table(frames, group_col).cache()
    num_cols = [c for c in tbl.columns if c != group_col]
    en_star = tbl.where(F.col(group_col).startswith("en-"))
    rolled = (
        en_star.withColumn(group_col, F.lit("en-*"))
        .groupBy(group_col)
        .agg(*[F.sum(c).alias(c) for c in num_cols])
    )
    main = (
        tbl.where(~F.col(group_col).startswith("en-"))
        .unionByName(rolled)
        .orderBy(group_col)
    )
    # both outputs carry the fold's cache handle so a caller can free
    # it (cachectl.release) — an internal-only .cache() is unreleasable
    return (
        tag_persisted(main, tbl),
        tag_persisted(en_star.orderBy(group_col), tbl),
    )


def salted_group_count(
    df: DataFrame, keys: list[str], n_salts: int = 32, count_col: str = "n"
) -> DataFrame:
    """Two-stage skew-safe group count: pre-aggregate on (keys, salt)
    with a uniform random-ish salt derived from the whole row, then
    sum the partials per key. Identical result to
    ``groupBy(keys).count()``; the difference is physical — a hot key's
    rows spread over ``n_salts`` reducers in stage one instead of
    landing on a single task.

    For plain counts Spark's map-side partial aggregation usually makes
    this unnecessary (SURVEY §4); it is the template for skewed
    aggregations whose partials are NOT map-side combinable
    (collect_set, exact distinct counts per key) and documents the
    salting lever the 100 TB posture calls for.
    """
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(n_salts))
    partial = (
        df.withColumn("__salt", salt)
        .groupBy(*keys, "__salt")
        .agg(F.count(F.lit(1)).alias("__partial"))
    )
    return partial.groupBy(*keys).agg(F.sum("__partial").alias(count_col))


def percentile_stats(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    ps: list[float] = (0.5, 0.9, 0.99),
    names: list[str] | None = None,
    approx: bool = False,
) -> DataFrame:
    """Per-group value-distribution percentiles — the corpus profiling
    step (document length / token count / score distributions) that
    gates curation thresholds.

    Exact mode uses ``percentile`` (linear interpolation at
    ``p*(n-1)``, matching SQL ``quantile_cont``); ``approx=True``
    switches to ``approx_percentile`` (t-digest-style sketch,
    map-side combinable) — the 100 TB path: the exact aggregate buffers
    each group's values, the sketch is constant-space per group and
    needs only the one groupBy shuffle of partial sketches.

    Returns one row per group with a rounded double column per
    percentile (default names ``p50, p90, p99``).

    Interpolating sibling of :func:`..textstats.token_percentiles`,
    which returns exact NEAREST-RANK integer token counts (the form a
    length gate consumes) rather than interpolated doubles.
    """
    # round, not int(): int(0.29 * 100) float-truncates to 28
    names = names or [f"p{round(p * 100)}" for p in ps]
    if len(names) != len(ps):
        raise ValueError("names must match ps")
    clash = set(names) & set(group_cols)
    if clash:
        raise ValueError(
            f"percentile names collide with group columns: {sorted(clash)}"
        )
    agg = (
        F.percentile_approx(value_col, list(ps), 10_000)
        if approx
        else F.percentile(value_col, F.array(*[F.lit(p) for p in ps]))
    )
    # collision-proof temp alias (same hazard ADVICE r5 flagged for a
    # fixed "__rn" in stratified_sample)
    tmp = "__ps"
    while tmp in group_cols:
        tmp = "_" + tmp
    grouped = df.groupBy(*group_cols).agg(agg.alias(tmp))
    return grouped.select(
        *group_cols,
        *[
            F.round(F.col(tmp).getItem(i).cast("double"), 4).alias(n)
            for i, n in enumerate(names)
        ],
    )
