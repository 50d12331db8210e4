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
    salt_hot_keys: int | None = None,
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

    ``salt_hot_keys=N`` — the skew escape hatch. The default plan puts
    each key's full timeline in ONE window task; a pathologically hot
    key (one user = half the rows) serializes into a single sort. With
    ``N`` set, ``ts_col`` (which must then be numeric) is range-split
    into N equal slices and the fill-forward window runs per
    ``(key, slice)`` — N-way parallel even for a single-key frame. A
    slice's leading left rows find their match through a CARRY-IN: the
    latest right row of every earlier slice, computed as a per-slice
    ``max(struct(ts, ord, match))`` aggregate (same (ts, ord) order the
    window uses) folded over the slice index — at most N rows per key,
    so the boundary pass is never itself skewed. Identical output;
    price is a second shuffle of the unioned frame (join with the
    carry map on ``(keys, slice)``) plus a 1-row min/max aggregate to
    place the slice boundaries. Worth it only when a key is hot enough
    to blow a task's sort budget.
    """
    order_col = order_col or payload_cols[0]
    match_struct = F.struct(
        F.col(ts_col).alias("__ts"),
        *[F.col(c).alias(c) for c in payload_cols],
    )
    # SQL equality semantics: a NULL join key matches nothing, but
    # Window.partitionBy groups nulls TOGETHER — drop null-key right
    # rows so they can't fill forward onto null-key left rows (which
    # still pass through with a null payload, like a left join)
    null_key_free = right
    for k in keys:
        null_key_free = null_key_free.where(F.col(k).isNotNull())
    r = null_key_free.select(
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

    def _fill_forward(df: DataFrame, part_cols: list[str]):
        w = (
            Window.partitionBy(*part_cols)
            .orderBy(F.col(ts_col).asc(), F.col("__side").asc(), F.col("__ord").asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        return F.last("__match", ignorenulls=True).over(w)

    if salt_hot_keys is None:
        # compute the window BEFORE dropping right rows — filtering
        # first would hide the right side from the window frame
        out = u.withColumn("__m", _fill_forward(u, keys))
    else:
        # the salted path slices on integer `div` arithmetic, so it
        # requires an integral ts (the unsalted path accepts any
        # orderable numeric). Fail loudly instead of emitting a long
        # literal like `123.5L` that dies at SQL analysis.
        ts_type = dict(u.dtypes)[ts_col]
        if ts_type not in ("tinyint", "smallint", "int", "bigint"):
            raise TypeError(
                f"salt_hot_keys requires an integral ts column; {ts_col} "
                f"is {ts_type} — cast to epoch integers first or use the "
                "unsalted path"
            )
        # bounded 1-row aggregate: slice boundaries for the range split
        lo, hi = u.agg(F.min(ts_col), F.max(ts_col)).first()
        width = max(1, ((hi or 0) - (lo or 0)) // salt_hot_keys + 1)
        u = u.withColumn(
            "__slice", F.expr(f"({ts_col} - {lo or 0}L) div {width}L")
        )
        in_slice = _fill_forward(u, [*keys, "__slice"])
        # equal ts => equal slice, so every right row in an earlier
        # slice satisfies ts < any left ts of this slice: the carry-in
        # is unconditionally valid, and an in-slice match (ts >= slice
        # start) always beats it — coalesce, not a comparison.
        best = F.max(
            F.struct(F.col(ts_col).alias("__ts"), "__ord", "__match")
        ).alias("__best")
        slice_last = (
            u.where(F.col("__side") == 0).groupBy(*keys, "__slice").agg(best)
        )
        w_prev = (
            Window.partitionBy(*keys)
            .orderBy("__slice")
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        carry = (
            u.select(*keys, "__slice")
            .distinct()
            .join(slice_last, [*keys, "__slice"], "left")
            .select(
                *keys, "__slice", F.max("__best").over(w_prev).alias("__carry")
            )
        )
        out = (
            u.withColumn("__in_slice", in_slice)
            .join(carry, [*keys, "__slice"], "left")
            .withColumn(
                "__m", F.coalesce(F.col("__in_slice"), F.col("__carry")["__match"])
            )
        )
    matched = F.col("__m")
    if tolerance is not None:
        matched = F.when(
            matched["__ts"] >= F.col(ts_col) - F.lit(tolerance), matched
        )
    out = out.withColumn("__m", matched).where(F.col("__side") == 1)
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

    ``radius`` must be >= 1: radius=0 would make the bucket expression
    a silent NULL (div by zero) and every count 0; simultaneous-event
    counting is a plain equi-join on ``(keys, ts)``, not a range join.
    """
    if radius < 1:
        raise ValueError(
            "radius must be >= 1 (for exact-ts matches use an equi-join "
            "on (keys, ts))"
        )
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
