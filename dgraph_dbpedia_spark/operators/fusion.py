"""Rank fusion for hybrid retrieval.

A corpus-mining / RAG pipeline rarely trusts ONE retriever: the
standard practice is to run a lexical arm (BM25) and a semantic arm
(embedding ANN) per query and fuse the ranked lists. Reciprocal Rank
Fusion (Cormack, Clarke & Buettcher, SIGIR 2009: "Reciprocal rank
fusion outperforms Condorcet and individual rank learning methods")
is the fusion rule every production hybrid-search stack ships:

    rrf_score(d) = sum over rankings r of 1 / (k + rank_r(d))

with ``k`` ~ 60 damping the head. Documents missing from an arm
contribute nothing for that arm — no score normalization across arms
is needed, which is the entire point of fusing on RANKS.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def rrf_fuse(
    rankings: Sequence[DataFrame],
    k: int = 60,
    group_cols: Sequence[str] = ("query_id",),
    id_col: str = "doc_id",
    score_col: str = "score",
    topn: int | None = None,
    round_decimals: int = 6,
) -> DataFrame:
    """Fuse per-group ranked lists by Reciprocal Rank Fusion.

    Every frame in ``rankings`` carries ``(*group_cols, id_col,
    score_col)`` — one row per (group, candidate) with that arm's
    score (each arm's own scale; scales never mix). Ranks are derived
    deterministically PER ARM: ``score_col`` descending, ``id_col``
    ascending on ties — the same tie rule the package's top-k
    emitters use, so fusing their output is rank-stable. Returns
    ``(*group_cols, id_col, rrf_score)``; ``topn`` keeps the best
    ``topn`` per group (rrf_score desc, id asc).

    Float determinism: each arm contributes at most ONE reciprocal
    term per (group, id) — the per-arm aggregate is a sum over a
    single row, exact — and the cross-arm total is added in the FIXED
    arm order, never through a partition-order-dependent float fold
    (the corpus_divergence r10 lesson, applied by construction).

    100 TB shape: per-arm rank windows shuffle each arm ONCE on its
    group key (arms are top-k lists — tiny next to the corpora that
    produced them), the union + one groupBy on (group, id) is
    partial-aggregable, and the optional per-group top-n is a window
    over the already-fused lists. No corpus-sized frame is touched.
    """
    if not rankings:
        raise ValueError("rankings must be a non-empty sequence of frames")
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    gcols = list(group_cols)
    keys = gcols + [id_col]
    tagged: DataFrame | None = None
    for i, r in enumerate(rankings):
        w = Window.partitionBy(*gcols).orderBy(
            F.col(score_col).desc(), F.col(id_col).asc()
        )
        t = r.select(
            *keys,
            (
                F.lit(1.0)
                / (F.lit(k) + F.row_number().over(w))
            ).alias(f"_rrf_{i}"),
        )
        # per-arm term in its OWN column so the cross-arm add below
        # happens in fixed arm order (order-deterministic by
        # construction); missing (group, id) rows in an arm surface
        # as NULL after the outer aggregation and coalesce to 0
        for j in range(len(rankings)):
            if j != i:
                t = t.withColumn(f"_rrf_{j}", F.lit(None).cast("double"))
        tagged = t if tagged is None else tagged.unionByName(t)
    per = tagged.groupBy(*keys).agg(
        *[
            F.sum(f"_rrf_{i}").alias(f"_rrf_{i}")
            for i in range(len(rankings))
        ]
    )
    score = F.coalesce(F.col("_rrf_0"), F.lit(0.0))
    for i in range(1, len(rankings)):
        score = score + F.coalesce(F.col(f"_rrf_{i}"), F.lit(0.0))
    out = per.select(
        *keys, F.round(score, round_decimals).alias("rrf_score")
    )
    if topn is not None:
        if topn < 1:
            raise ValueError(f"topn must be >= 1, got {topn}")
        wf = Window.partitionBy(*gcols).orderBy(
            F.col("rrf_score").desc(), F.col(id_col).asc()
        )
        out = (
            out.withColumn("_rn", F.row_number().over(wf))
            .where(F.col("_rn") <= topn)
            .drop("_rn")
        )
    return out
