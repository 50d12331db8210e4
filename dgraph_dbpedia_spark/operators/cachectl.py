"""Caller-visible cache scope for operators that persist intermediates.

Several pair-finding operators (`dedup.ngram_jaccard_pairs`,
`dedup.minhash_dedup_pairs`, `similarity.cosine_near_dup_pairs`, ...)
persist a frame that feeds both sides of a self-join — without the
persist the sketch computation runs twice (Spark does not share
subplans across join branches). A long-lived session calling these
repeatedly would otherwise accumulate cached partitions forever.

The contract: the operator tags its result with the persisted handles;
the caller releases them with :func:`release` once the result has been
materialized (collected / written). Releasing before materialization is
safe but forfeits the single-computation guarantee.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_ATTR = "_graft_persisted"


def tag_persisted(result: DataFrame, *frames: DataFrame) -> DataFrame:
    """Attach persisted intermediate handles to ``result`` so the caller
    can free them with :func:`release` after materializing."""
    existing = list(getattr(result, _ATTR, ()))
    setattr(result, _ATTR, existing + list(frames))
    return result


def persisted_frames(result: DataFrame) -> list[DataFrame]:
    return list(getattr(result, _ATTR, ()))


def release(result: DataFrame) -> int:
    """Unpersist every intermediate the operator cached for ``result``.
    Returns the number of frames released. Idempotent."""
    frames = persisted_frames(result)
    for f in frames:
        f.unpersist()
    setattr(result, _ATTR, [])
    return len(frames)


def release_local_checkpoint(df: DataFrame) -> bool:
    """Deterministically free a ``localCheckpoint()``-ed frame's blocks.

    ``DataFrame.unpersist`` does not reach them (they live on the
    checkpointed RDD inside the plan's ``LogicalRDD``, not in the SQL
    cache manager), so without this they linger until the driver GC
    notices the dropped reference — at scale an iterative algorithm
    checkpointing per round would hold every round's frame
    simultaneously. Only call once NOTHING will read ``df`` again: the
    blocks ARE the data (local checkpoints have no lineage to recompute
    from). Returns False if the internal accessor is unavailable (the
    blocks then fall back to GC-based ContextCleaner release) — call
    sites may keep ignoring the return value, but the first fallback is
    logged loudly so a Spark upgrade that breaks the py4j path surfaces
    in any run's output, not only via the pytest that pins block
    release (ADVICE r8)."""
    global _warned_release_fallback
    try:
        df._jdf.queryExecution().analyzed().rdd().unpersist(False)
        return True
    except Exception:
        if not _warned_release_fallback:
            _warned_release_fallback = True
            import logging

            logging.getLogger(__name__).warning(
                "release_local_checkpoint: internal RDD accessor "
                "unavailable on this Spark build — checkpoint blocks "
                "now fall back to GC-based ContextCleaner release "
                "(iterative operators may hold more storage than the "
                "deterministic-release design intends)"
            )
        return False


_warned_release_fallback = False
