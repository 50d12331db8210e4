"""End-to-end corpus curation plan — the composition a pretraining
data pipeline actually runs, assembled from the individually
oracle-verified operators:

    quality gate (Gopher rules) -> exact dedup -> MinHash near-dup
    dedup -> benchmark decontamination -> temperature resampling

Each stage is the package's first-class operator
(`operators.textstats.gopher_quality_filter`, `operators.dedup.
exact_dedup` / `minhash_dedup_pairs` / `dedup_corpus` /
`decontaminate`, `operators.sampling.temperature_sample`); this module
only owns the ordering and the cache scope. Ordering rationale for
100 TB: the quality gate is a pure narrow projection (cheapest, most
selective — run first so every later stage sees fewer rows), exact
dedup is one groupBy on an 8-byte hash, near-dup and decontamination
are the expensive banded/semi-join stages and run on the pruned
corpus, and resampling is a narrow filter that must be LAST (rates
are calibrated on the curated distribution).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def curate_corpus(
    docs: DataFrame,
    benchmark: DataFrame | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    lang_col: str = "lang",
    gopher_kwargs: dict | None = None,
    near_dup_threshold: float = 0.5,
    w: int = 3,
    k: int = 16,
    bands: int = 4,
    decontaminate_w: int = 13,
    alpha: float | None = None,
    seed: int = 2,
    **cluster_kwargs,
) -> DataFrame:
    """Run the full curation chain over ``docs``; returns the surviving
    rows with all original columns. ``benchmark`` (optional) enables
    the decontamination stage; ``alpha`` (optional) enables the final
    per-``lang_col`` temperature resampling. ``gopher_kwargs`` override
    the quality-gate thresholds; ``w``/``k``/``bands``/
    ``near_dup_threshold`` parameterize the MinHash stage and
    ``cluster_kwargs`` pass through to its component clusterer.

    Cache scope: the quality-gate id set AND the post-exact-dedup
    corpus are persisted — gk feeds both branches of s2's plan (the
    exact-dedup aggregate and the survivor semi-join), s2 feeds the
    near-dup pair generation (twice, via the self-join), the component
    completion join and the representative semi-join. The result
    carries both handles (release via
    :func:`dgraph_dbpedia_spark.operators.cachectl.release` after
    materializing); on a clusterer failure they are released before
    the re-raise. The MinHash pair frame's own handles are released
    internally once the (eager) component step has consumed them."""
    from dgraph_dbpedia_spark.operators.cachectl import release, tag_persisted
    from dgraph_dbpedia_spark.operators.dedup import (
        decontaminate,
        dedup_corpus,
        exact_dedup,
        minhash_dedup_pairs,
    )
    from dgraph_dbpedia_spark.operators.sampling import temperature_sample
    from dgraph_dbpedia_spark.operators.textstats import gopher_quality_filter

    # 1. quality gate — narrow projection, most selective, runs first.
    # gk is PERSISTED (id-only, far smaller than the corpus): it feeds
    # both branches of s2's plan — the exact_dedup aggregate's s1 AND
    # the survivor semi-join's s1 — and without the cache the
    # tokenize-heavy gate would evaluate twice when s2 first
    # materializes (inside s2's own plan, where s2's persist cannot
    # help).
    gk = (
        gopher_quality_filter(
            docs, text_col=text_col, id_col=id_col, **(gopher_kwargs or {})
        )
        .where(F.col("keep"))
        .select(F.col(id_col))
        .persist()
    )
    s1 = docs.join(gk, id_col, "left_semi")

    # 2. exact dedup — min-id representative per distinct text (one
    # groupBy on the md5 hash), then keep those rows
    reps = exact_dedup(s1, text_col=text_col, id_col=id_col).select(
        F.col(id_col)
    )
    s2 = s1.join(reps, id_col, "left_semi").persist()

    # 3. near-dup dedup — banded MinHash pairs + connected-component
    # min-id survivors over the exact-deduped corpus
    pairs = minhash_dedup_pairs(
        s2, text_col=text_col, id_col=id_col, w=w, k=k, bands=bands,
        threshold=near_dup_threshold,
    )
    try:
        s3 = dedup_corpus(
            s2, pairs.select("a", "b"), id_col=id_col, **cluster_kwargs
        )
    except BaseException:
        # the clusterer raised (e.g. the documented max_iter
        # non-convergence): there is no result to carry the handles,
        # and s2/gk were already materialized by the eager component
        # step — they must not outlive the failure in a shared session
        s2.unpersist()
        gk.unpersist()
        raise
    finally:
        # the component step ran eagerly inside dedup_corpus (or
        # raised); either way the pair caches are dead weight now
        release(pairs)

    # stages 4-5 can also raise before the handles transfer to the
    # result (e.g. a benchmark frame missing text_col fails eager
    # analysis inside decontaminate) — the same must-not-outlive rule
    # as the stage-3 guard above
    try:
        # 4. benchmark decontamination — w-gram hash semi-join kill
        s4 = (
            decontaminate(
                s3, benchmark, w=decontaminate_w, text_col=text_col,
                id_col=id_col, bench_text_col=text_col,
            )
            if benchmark is not None
            else s3
        )

        # 5. temperature resampling — LAST, so rates calibrate on the
        # curated distribution
        s5 = (
            temperature_sample(
                s4, group_col=lang_col, alpha=alpha, id_col=id_col, seed=seed
            )
            if alpha is not None
            else s4
        )
    except BaseException:
        s2.unpersist()
        gk.unpersist()
        raise
    return tag_persisted(s5, s2, gk)


def pretraining_prep(
    docs: DataFrame,
    benchmark: DataFrame | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    lang_col: str = "lang",
    chunk_tokens: int = 128,
    overlap: int = 16,
    fractions: dict[str, float] | None = None,
    split_seed: int = 1,
    epoch: int = 3,
    n_shards: int = 4,
    **curate_kwargs,
) -> DataFrame:
    """The second half of a real pretraining pipeline, composed
    end-to-end on top of :func:`curate_corpus` (which pins the first
    half): curate -> chunk -> split -> epoch-shuffle. The composition
    is where ordering bugs hide, and this function owns exactly those
    ordering decisions:

    - chunks are computed on the curation SURVIVORS only (never on
      rows a later-stage dedup would have dropped — offsets/windows on
      pre-curation rows are wasted work AND wrong training data);
    - the split is keyed on the DOCUMENT id, applied after chunking —
      every chunk of a doc lands in the SAME split, so train can never
      see a val/test doc's other half (the leakage a chunk-keyed split
      would silently allow);
    - the epoch shuffle runs LAST and only over the train split, keyed
      on the chunk-unique ``doc_id#chunk_idx`` key (a doc-keyed
      shuffle would tie every chunk of a doc on the same hash and let
      ``row_number`` break the tie nondeterministically).

    Returns ``(id, chunk_idx, n_tokens, split, shard, pos)`` — one row
    per surviving chunk; ``shard``/``pos`` are the epoch-``epoch``
    delivery order for train rows and NULL for val/test/holdout rows.
    The result carries :func:`curate_corpus`'s persist handles
    (release via ``cachectl.release`` after materializing).

    100 TB shape: every added stage is narrow over the curated frame
    (chunking is scan-speed posexplode, the split a codegen'd hash
    projection) except the final per-shard ordering window — ONE
    shuffle of the train chunks, ``n_shards`` the parallelism dial,
    exactly :func:`~dgraph_dbpedia_spark.operators.sampling.
    epoch_shuffle`'s documented shape."""
    from dgraph_dbpedia_spark.operators.cachectl import (
        persisted_frames,
        tag_persisted,
    )
    from dgraph_dbpedia_spark.operators.sampling import (
        chunk_documents,
        epoch_shuffle,
        split_corpus,
    )

    if fractions is None:
        fractions = {"train": 0.8, "val": 0.1, "test": 0.1}
    # validate every cheap post-curate knob BEFORE the expensive
    # curation chain runs: a bad overlap/fraction/shard count must
    # fail in milliseconds, not after the minhash/component stages
    # have already materialized their caches. (The throwaway frame
    # never executes — each operator's knob validation raises at
    # plan-construction time.)
    _probe = docs.limit(0)
    split_corpus(
        chunk_documents(
            _probe,
            chunk_tokens=chunk_tokens,
            overlap=overlap,
            text_col=text_col,
            id_col=id_col,
        ),
        fractions,
        id_col=id_col,
        seed=split_seed,
    )
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    curated = curate_corpus(
        docs,
        benchmark=benchmark,
        text_col=text_col,
        id_col=id_col,
        lang_col=lang_col,
        **curate_kwargs,
    )
    # the post-curate stages can still raise before the handles
    # transfer to the result (an unexpected schema, an epoch_shuffle
    # column clash) — curate's eagerly-materialized s2/gk caches must
    # not outlive the failure in a shared session (the curate_corpus
    # stage-4/5 must-not-outlive rule, applied to the composition)
    keyed = None
    try:
        chunks = chunk_documents(
            curated,
            chunk_tokens=chunk_tokens,
            overlap=overlap,
            text_col=text_col,
            id_col=id_col,
        )
        # doc-keyed split AFTER chunking: the coin hashes id_col, so
        # all chunks of a doc agree — see the leakage note above
        tagged = split_corpus(
            chunks, fractions, id_col=id_col, seed=split_seed
        )
        ck = "__ck"
        while ck in tagged.columns:
            ck = "_" + ck
        # PERSISTED: keyed feeds both union branches (train + rest) —
        # without the cache the whole post-s2 chain (decontamination
        # semi-join, temperature filter, chunk explode, split coin)
        # executes twice, once per branch (no cross-branch subplan
        # sharing — the _semantic_sk_pairs rule). The handle rides the
        # result with curate's.
        keyed = tagged.withColumn(
            ck,
            F.concat_ws(
                "#", F.col(id_col).cast("string"), F.col("chunk_idx")
            ),
        ).persist()
        train = epoch_shuffle(
            keyed.where(F.col("split") == "train"),
            epoch=epoch,
            n_shards=n_shards,
            id_col=ck,
        )
        rest = (
            keyed.where(
                (F.col("split") != "train") | F.col("split").isNull()
            )
            .withColumn("shard", F.lit(None).cast("int"))
            .withColumn("pos", F.lit(None).cast("int"))
        )
        out = train.unionByName(rest).select(
            F.col(id_col), "chunk_idx", "n_tokens", "split", "shard",
            "pos",
        )
    except BaseException:
        if keyed is not None:
            keyed.unpersist()
        for f in persisted_frames(curated):
            f.unpersist()
        raise
    return tag_persisted(out, keyed, *persisted_frames(curated))
