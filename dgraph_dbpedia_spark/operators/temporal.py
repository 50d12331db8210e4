"""Temporal join operators: as-of join and bucketed range join.

Spark has no native as-of or interval join (SPARK-22947 stalled); the
naive encodings — a theta-join on ``l.ts >= r.ts`` or a per-row
subquery — are O(n·m) row explosions that die long before 100 TB.
These implement the two scalable shapes:

* :func:`asof_join` — the union + sorted-window fill-forward encoding:
  ONE shuffle on the join keys, state bounded by the window sort, no
  row explosion at any scale.  The same trick streaming systems use for
  temporal table joins (Flink's event-time temporal join produces the
  same semantics with the same per-key ordered state).
* :func:`range_count_join` — the bucketize + neighbor-bucket equi-join
  encoding of ``|l.ts - r.ts| <= radius``: candidate pairs are bounded
  by bucket co-location (3 buckets per probe row), the range predicate
  is applied AFTER the equi-join, so Catalyst runs a hash join, never a
  broadcast-nested-loop.

Timestamps are treated as plain comparable integers — convert
timestamp columns up front (e.g. ``streaming.events.epoch_seconds``,
which handles both the nanos-long and TIMESTAMP_NTZ driver layouts).
Any monotonic orderable type works for :func:`asof_join` when
``tolerance`` is None; the tolerance guard and :func:`range_count_join`
need integer arithmetic (integer ``div`` — double division loses
precision above 2^53, which epoch-nanos exceeds).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    ts_col: str,
    payload_cols: list[str],
    order_col: str | None = None,
    tolerance: int | None = None,
    prefix: str = "matched_",
) -> DataFrame:
    """For each left row, attach the payload of the LATEST right row
    with the same ``keys`` and ``right.ts <= left.ts`` (inclusive;
    backward as-of). Left rows with no prior right row keep nulls.

    Ties on ``ts`` among right rows break by the largest ``order_col``
    (default: the first payload column) — deterministic, and matching
    ``ORDER BY ts DESC, order DESC LIMIT 1`` in a lateral-subquery
    formulation.

    Implementation: tag sides, ``unionByName``, one window per ``keys``
    ordered by ``(ts, side, order)`` with an ``ignorenulls`` ``last``
    over a STRUCT of the right payload — the struct keeps all payload
    columns from the SAME right row (per-column ``last`` could mix rows
    when a payload value is legitimately null).  Single exchange on
    ``keys``; sort-based window, no join explosion.

    ``tolerance`` (same units as ``ts_col``): matches older than
    ``left.ts - tolerance`` are nulled out — the "don't join across a
    session gap" guard every feature-store as-of join needs.
    """
    order_col = order_col or payload_cols[0]
    match_struct = F.struct(
        F.col(ts_col).alias("__ts"),
        *[F.col(c).alias(c) for c in payload_cols],
    )
    r = right.select(
        *[F.col(k) for k in keys],
        F.col(ts_col),
        F.col(order_col).alias("__ord"),
        match_struct.alias("__match"),
        F.lit(0).alias("__side"),
    )
    l = left.withColumn("__side", F.lit(1)).withColumn(
        "__ord", F.lit(None).cast(r.schema["__ord"].dataType)
    )
    u = l.unionByName(r, allowMissingColumns=True)

    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col(ts_col).asc(), F.col("__side").asc(), F.col("__ord").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = F.last("__match", ignorenulls=True).over(w)
    if tolerance is not None:
        matched = F.when(
            matched["__ts"] >= F.col(ts_col) - F.lit(tolerance), matched
        )
    # compute the window BEFORE dropping right rows — filtering first
    # would hide the right side from the window frame
    out = u.withColumn("__m", matched).where(F.col("__side") == 1)
    return out.select(
        *[c for c in left.columns],
        *[F.col("__m")[c].alias(f"{prefix}{c}") for c in payload_cols],
        (F.col(ts_col) - F.col("__m")["__ts"]).alias(f"{prefix}lag"),
    )


def range_count_join(
    probe: DataFrame,
    events: DataFrame,
    keys: list[str],
    ts_col: str,
    radius: int,
    probe_id: str = "event_id",
    count_col: str = "n_in_range",
) -> DataFrame:
    """Per probe row: how many ``events`` rows share ``keys`` and lie
    within ``|event.ts - probe.ts| <= radius``. Zero-match probes are
    kept (count 0).

    Bucket width = ``radius``: every in-range event is in the probe's
    bucket or an adjacent one, so exploding the probe side to its 3
    candidate buckets + an equi-join on ``(keys, bucket)`` finds every
    pair exactly once (each event has ONE bucket) with no row explosion
    beyond 3x on the small probe side.  The range predicate rides the
    join condition, post-hash-match.

    Bucket ids use integer ``div`` — epoch-nanos exceed 2^53, so a
    double division here would corrupt bucket boundaries.
    """
    bucket = F.expr(f"{ts_col} div {radius}L")
    p = probe.select(
        F.col(probe_id),
        *[F.col(k) for k in keys],
        F.col(ts_col).alias("__pts"),
        F.explode(
            F.array(bucket - 1, bucket, bucket + 1)
        ).alias("__bucket"),
    )
    e = events.select(
        *[F.col(k).alias(f"__e_{k}") for k in keys],
        F.col(ts_col).alias("__ets"),
        bucket.alias("__ebucket"),
    )
    cond = F.col("__bucket") == F.col("__ebucket")
    for k in keys:
        cond = cond & (F.col(k) == F.col(f"__e_{k}"))
    cond = cond & (
        F.abs(F.col("__ets") - F.col("__pts")) <= F.lit(radius)
    )
    joined = p.join(e, cond, "left")
    return joined.groupBy(probe_id).agg(
        F.count("__ets").alias(count_col)
    )
