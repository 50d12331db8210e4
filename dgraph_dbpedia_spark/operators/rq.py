"""Residual quantization (RQ) — the ADDITIVE compression sibling of
product quantization.

Chen, Guan & Wang, "Approximate Nearest Neighbor Search by Residual
Vector Quantization" (Sensors 2010; the FAISS ``ResidualQuantizer`` /
RQ-VAE layout): quantize the FULL vector with a first k-means
codebook, then quantize the RESIDUAL ``x - c1`` with a second, and so
on — the reconstruction is the SUM ``c1 + c2 + ...`` rather than PQ's
concatenation of subspace centroids. Where PQ splits dimensions, RQ
splits MAGNITUDE: each stage spends its codebook on whatever error the
previous stages left anywhere in the vector, which wins when variance
is concentrated in a few directions rather than spread evenly across
subspaces.

Engine mapping (all JVM-native, oracle-replayable — no SVD, no
randomness, unlike OPQ):

- each stage trains with the package's ONE deterministic L2 Lloyd
  (:func:`..pq.pq_train` with ``m=1``: lowest-id seeds, round-6
  squared-L2 assignment with dense-cid-asc ties, per-iteration
  rounded means, empty clusters keep their previous centroid);
- residuals between stages are exact double subtractions of the
  ROUNDED centroids (both engines compute identical values);
- encoding is a greedy per-stage nearest — a pure projection against
  ONE broadcast codebook row, shuffle-free over the corpus;
- ADC scoring folds TWO bounded broadcast tables: per (stage, cid)
  dot/norm terms, plus the k1 x k2 cross-dot table the additive
  reconstruction norm needs (``|c1 + c2|^2 = |c1|^2 + |c2|^2 +
  2 c1.c2`` — separable per stage EXCEPT the cross term, which PQ's
  orthogonal subspaces make zero by construction and RQ must carry).

Approximation contract mirrors :func:`..pq.pq_topk`: ``sim`` is the
round-4 ADC cosine of the reconstruction; recall is pinned by pytest,
never assumed; the deployed contract is shortlist-for-exact-re-rank
(:func:`..pq._exact_rerank` composes unchanged).
"""

from __future__ import annotations

import pandas as pd  # module-level: pandas_udf type hints must resolve
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dgraph_dbpedia_spark.operators.pq import (
    _exact_rerank,
    _nearest_l2,
    _validate_shortlist,
    pq_train,
)
from dgraph_dbpedia_spark.operators.similarity import _dot


def _rq_validate(dims: int, k_sub: int, n_levels: int) -> None:
    if dims < 1:
        raise ValueError(f"dims must be >= 1, got {dims}")
    if k_sub < 1:
        raise ValueError(f"k_sub must be >= 1, got {k_sub}")
    if n_levels < 1:
        raise ValueError(f"n_levels must be >= 1, got {n_levels}")


def _stage_row(codebooks: DataFrame, lvl: int) -> DataFrame:
    """One stage's bounded ``(cid, c)`` rows folded to ONE broadcast
    row ``_cent`` (the shape :func:`..pq._nearest_l2` consumes)."""
    return (
        codebooks.where(F.col("lvl") == lvl)
        .agg(
            F.collect_list(F.struct(F.col("cid"), F.col("c"))).alias(
                "_cent"
            )
        )
    )


def _validate_rq_codebooks(
    codebooks: DataFrame, dims: int, n_levels: int
) -> int:
    """Bounded validation read (the pq_topk discipline, shared by
    encode and serve so a mismatched frame raises LOUDLY instead of
    emitting silent NULL codes/sims): stages must cover exactly
    0..n_levels-1, cids must be dense 0..k_sub-1 per stage, and every
    centroid must be ``dims`` wide. Returns ``k_sub``. The collect is
    capped so a corpus frame passed by mistake raises before it can
    OOM the driver."""
    _CB_CAP = 1 << 20
    rows = (
        codebooks.select("lvl", "cid", F.size("c").alias("w"))
        .limit(_CB_CAP + 1)
        .collect()
    )
    if len(rows) > _CB_CAP:
        raise ValueError(
            f"codebooks frame exceeds {_CB_CAP} rows — expected the "
            "bounded n_levels * k_sub codebook frame"
        )
    per: dict[int, list] = {}
    for r in rows:
        per.setdefault(r["lvl"], []).append(r["cid"])
        if r["w"] != dims:
            raise ValueError(
                f"stage {r['lvl']} centroid width {r['w']} != dims "
                f"{dims}"
            )
    if sorted(per) != list(range(n_levels)):
        raise ValueError(
            f"codebooks must cover stages 0..{n_levels - 1}, got "
            f"{sorted(per)}"
        )
    k_sub = len(per[0])
    for lvl in range(n_levels):
        if sorted(per[lvl]) != list(range(k_sub)):
            raise ValueError(
                f"stage {lvl} cids must be dense 0..{k_sub - 1} "
                "(rq_train emits dense cids)"
            )
    return k_sub


def _winning_c():
    """The winning centroid's vector, picked from the bound ``_cent``
    broadcast list by the bound ``_b`` struct's cid (both must already
    be generated attributes of the current select — see the
    CollapseProject notes at the call sites)."""
    return F.get(
        F.filter(
            F.col("_cent"), lambda s: s["cid"] == F.col("_b")["cid"]
        ),
        0,
    )["c"]


def rq_train(
    df: DataFrame,
    dims: int,
    k_sub: int = 16,
    n_levels: int = 2,
    n_iter: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_decimals: int = 4,
    use_arrow: bool = True,
) -> DataFrame:
    """Train the ``n_levels`` stage codebooks greedily (the standard
    RQ recipe: stage ``l`` k-means the residuals stage ``l-1`` left).
    Returns ``(lvl, cid, c)`` — ``n_levels * k_sub`` bounded rows,
    cids DENSE in 0..k_sub-1 per stage, components rounded to
    ``round_decimals`` (bit-reproducible across engines and
    partitionings — the ivf_train/pq_train contract).

    100 TB shape: each stage is one :func:`..pq.pq_train` ``m=1`` run
    (fused corpus pass per iteration) plus, between stages, ONE
    shuffle-free assignment projection producing the residual frame
    (localCheckpoint-ed so stage ``l+1``'s iterations re-read a
    materialized frame instead of re-deriving ``l`` stages of
    residuals per pass).

    ``use_arrow=True`` (default) routes BOTH per-row L2 assignments
    through the pinned :func:`..pq.encode_codes_arrow` kernel: the
    stage Lloyd iterations (via ``pq_train(use_arrow=True)``) and the
    between-stage residual assignment (an ``m=1`` single-stage encode
    against the just-trained codebook; the winning centroid is still
    picked natively from the broadcast stage row by the returned cid,
    and the residual subtraction stays the exact native ``zip_with``).
    RQ's native full-dim fold is the package's worst interpreted
    assignment — ``n x k_sub x dims`` HOF multiply-adds per pass made
    k_sub=256 training unrunnable at 200k vectors (BENCH_SCALE r12) —
    while assignments stay bit-equal (pinned: both-lane codebooks
    compare exactly), so trained values and the DuckDB replay are
    unchanged. ``use_arrow=False`` remains the JVM-only oracle
    surface."""
    from dgraph_dbpedia_spark.operators.cachectl import (
        release_local_checkpoint,
    )

    _rq_validate(dims, k_sub, n_levels)
    cur = df.select(
        F.col(id_col), F.col(vec_col).cast("array<double>").alias("_rv")
    )
    out: DataFrame | None = None
    cps: list[DataFrame] = []
    for lvl in range(n_levels):
        cb = pq_train(
            cur,
            dims,
            m=1,
            k_sub=k_sub,
            n_iter=n_iter,
            id_col=id_col,
            vec_col="_rv",
            round_decimals=round_decimals,
            use_arrow=use_arrow,
        ).select(F.lit(lvl).alias("lvl"), "cid", "c")
        out = cb if out is None else out.unionByName(cb)
        if lvl < n_levels - 1:
            stage = _stage_row(cb, lvl)
            if use_arrow:
                # single-stage Arrow encode against the just-trained
                # (checkpointed, bounded) codebook: one bounded
                # driver read + one matmul kernel instead of the
                # full-dim n x k_sub HOF fold. The cid binds in its
                # OWN select (CollapseProject) and the winning
                # centroid/residual stay native — identical values
                # either lane.
                from dgraph_dbpedia_spark.operators.pq import (
                    _collect_codebooks,
                    encode_codes_arrow,
                )

                enc = encode_codes_arrow(
                    _collect_codebooks(
                        cb.select(F.lit(0).alias("j"), "cid", "c"),
                        1,
                        dims,
                    )
                )
                # width mask: the native residual fold zip_withs the
                # FULL vector (no slicing), so a vector LONGER than
                # dims NULL-pads the centroid side -> d NULL -> cid 0,
                # while the encode kernel would prefix-encode it.
                # Masking non-dims-width vectors to NULL reproduces
                # the kernel's code-0 class for them (shorter/NULL
                # rows already land there in both lanes).
                masked = F.when(
                    F.size("_rv") == F.lit(dims), F.col("_rv")
                )
                asg = cur.select(
                    F.col(id_col),
                    F.col("_rv"),
                    F.get(enc(masked), 0).alias("_c0"),
                ).crossJoin(F.broadcast(stage))
                win = F.get(
                    F.filter(
                        F.col("_cent"),
                        lambda s: s["cid"] == F.col("_c0"),
                    ),
                    0,
                )["c"]
                cur = asg.select(
                    F.col(id_col),
                    F.zip_with("_rv", win, lambda a, b: a - b).alias(
                        "_rv"
                    ),
                ).localCheckpoint()
            else:
                # nearest bound in its OWN select (the CollapseProject
                # trap); _nearest_l2's sorted struct carries only
                # (d, cid), so the winning centroid VECTOR is picked
                # from the bounded broadcast list in the next select
                # (an O(k) filter per row — cids are unique, exactly
                # one match)
                asg = cur.crossJoin(F.broadcast(stage)).select(
                    F.col(id_col),
                    F.col("_rv"),
                    F.col("_cent"),
                    _nearest_l2(F.col("_rv"), F.col("_cent")).alias(
                        "_b"
                    ),
                )
                cur = asg.select(
                    F.col(id_col),
                    F.zip_with(
                        "_rv", _winning_c(), lambda a, b: a - b
                    ).alias("_rv"),
                ).localCheckpoint()
            cps.append(cur)
    # stage residual checkpoints are only read while the NEXT stage
    # trains, and `out` is built solely from pq_train's own
    # checkpointed (lineage-free) frames — so EVERY residual
    # checkpoint is garbage by now; free them all (the r12 review
    # caught a cps[:-1] slice here stranding one corpus-sized frame
    # per training run)
    for cp in cps:
        release_local_checkpoint(cp)
    return out


def rq_codes_arrow(cmats):
    """Vectorized twin of the native greedy encode for ``n_levels``
    stages: per Arrow batch and stage, ONE norm-expansion matmul
    ``||x||^2 - 2 x.C^T + ||c||^2`` (the :func:`..pq.encode_codes_arrow`
    memory shape — ``(batch, k_sub)``, never a broadcast tensor) +
    round-6 HALF_UP + first-min ``argmin`` (the native L2-asc/cid-asc
    tie rule), then the residual ``x - C[code]`` feeds the next stage.
    Bit-equality posture matches the PQ kernel (pinned on real data by
    pytest; cancellation negatives clamped to 0 so a self-match can't
    round to -0.0). Degenerate rows match the native lane: a NULL or
    width-mismatched vector takes code 0 at EVERY stage (native:
    NULL-padded distances against every centroid tie to the lowest
    dense cid), and a non-finite vector — or a non-finite CENTROID —
    ranks by the native finite < inf < NaN tier rule via
    :func:`..pq._l2_codes_np` (code 0 against a finite codebook; RQ
    uses the FULL vector, so one bad component degrades the whole
    row, unlike PQ's per-subspace containment)."""
    import numpy as np
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import ArrayType, IntegerType

    from dgraph_dbpedia_spark.operators.pq import _l2_codes_np

    n_levels = len(cmats)
    dims = int(cmats[0].shape[1])
    cnorms = [(C * C).sum(axis=1) for C in cmats]

    def enc(emb: pd.Series) -> pd.Series:
        import numpy as np  # noqa: F811 — resolve inside the worker

        n = len(emb)
        if n == 0:
            return pd.Series([], dtype=object)
        vals = emb.tolist()
        bad = np.fromiter(
            (v is None or len(v) != dims for v in vals),
            dtype=bool,
            count=n,
        )
        X = np.zeros((n, dims), dtype=np.float64)
        for i, v in enumerate(vals):
            if not bad[i]:
                X[i] = v
        # non-finite rows are NOT zeroed: _l2_codes_np recomputes
        # their distance rows elementwise to the native inf/NaN class
        # and ranks finite < inf < NaN, so their codes — and their
        # propagated non-finite residuals — match the native lane
        # even against a codebook that itself carries non-finite
        # centroids (the r12 training-lane finding)
        codes = np.zeros((n, n_levels), dtype=np.int64)
        R = X
        for lvl, C in enumerate(cmats):
            cl = _l2_codes_np(R, C, cnorms[lvl])
            cl[bad] = 0
            codes[:, lvl] = cl
            if lvl < n_levels - 1:
                R = R - C[cl]
        return pd.Series([[int(c) for c in row] for row in codes])

    return pandas_udf(enc, ArrayType(IntegerType()))


def _collect_rq_codebooks(codebooks: DataFrame, dims: int, n_levels: int):
    """ONE bounded driver read serving BOTH the validation and the
    Arrow gather (the r12 review flagged a validate-then-collect
    double read): coverage, density and width checked on the collected
    rows, then per-stage ``(k_sub, dims)`` matrices in dense cid order
    (argmin's first-min tie equals the native L2-asc/cid-asc rule).
    Near-twin of pq's ``_collect_codebooks`` — kept separate because
    the stage column and the full-dim width contract differ, but any
    fix to one should be checked against the other."""
    import numpy as np

    _CB_CAP = 1 << 20
    rows = (
        codebooks.select(
            "lvl", "cid", F.col("c").cast("array<double>").alias("c")
        )
        .limit(_CB_CAP + 1)
        .collect()
    )
    if len(rows) > _CB_CAP:
        raise ValueError(
            f"codebooks frame exceeds {_CB_CAP} rows — expected the "
            "bounded n_levels * k_sub codebook frame"
        )
    per: dict[int, list] = {}
    for r in rows:
        per.setdefault(r["lvl"], []).append((r["cid"], list(r["c"])))
        if len(r["c"]) != dims:
            raise ValueError(
                f"stage {r['lvl']} centroid width {len(r['c'])} != "
                f"dims {dims}"
            )
    if sorted(per) != list(range(n_levels)):
        raise ValueError(
            f"codebooks must cover stages 0..{n_levels - 1}, got "
            f"{sorted(per)}"
        )
    k_sub = len(per[0])
    for lvl in range(n_levels):
        if sorted(c for c, _ in per[lvl]) != list(range(k_sub)):
            raise ValueError(
                f"stage {lvl} cids must be dense 0..{k_sub - 1} "
                "(rq_train emits dense cids)"
            )
    return [
        np.asarray(
            [c for _, c in sorted(per[lvl])], dtype=np.float64
        )
        for lvl in range(n_levels)
    ]


def rq_encode(
    df: DataFrame,
    codebooks: DataFrame,
    dims: int,
    n_levels: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    use_arrow: bool = True,
) -> DataFrame:
    """Greedy RQ encoding: per stage, the nearest centroid of the
    running residual (round-6 L2 asc, cid asc). Returns ``(id, codes:
    array<int>)`` with ``codes[l]`` the stage-``l`` dense cid —
    SHUFFLE-FREE over the corpus either way (the pq_encode posture):

    - ``use_arrow=True`` (default): the validated bounded codebook
      frame is collected driver-side and both stages encode as one
      norm-expansion matmul per Arrow batch (:func:`rq_codes_arrow`)
      — the interpreted full-dim ``k_sub``-centroid fold per row per
      stage is the measured encode cost at the 200k/k_sub=256 scale
      point. Pinned bit-equal to the native lane by pytest.
    - ``use_arrow=False``: the JVM-only oracle surface — one
      projection per stage against ONE broadcast codebook row,
      residuals carried as generated columns between binds (each
      stage's nearest bound in its own select — the CollapseProject
      trap)."""
    _rq_validate(dims, k_sub=1, n_levels=n_levels)
    if use_arrow:
        # the gather validates (ONE bounded collect, not
        # validate-then-collect — r12 review)
        enc = rq_codes_arrow(
            _collect_rq_codebooks(codebooks, dims, n_levels)
        )
        return df.select(
            F.col(id_col),
            enc(F.col(vec_col).cast("array<double>")).alias("codes"),
        )
    _validate_rq_codebooks(codebooks, dims, n_levels)
    cur = df.select(
        F.col(id_col), F.col(vec_col).cast("array<double>").alias("_rv")
    )
    code_cols: list[str] = []
    for lvl in range(n_levels):
        stage = _stage_row(codebooks, lvl)
        bound = cur.crossJoin(F.broadcast(stage)).select(
            "*",
            _nearest_l2(F.col("_rv"), F.col("_cent")).alias("_b"),
        )
        ccol = f"_c{lvl}"
        sel = [F.col(id_col)] + [F.col(c) for c in code_cols]
        sel.append(F.col("_b")["cid"].alias(ccol))
        if lvl < n_levels - 1:
            sel.append(
                F.zip_with("_rv", _winning_c(), lambda a, b: a - b).alias(
                    "_rv"
                )
            )
        cur = bound.select(*sel)
        code_cols.append(ccol)
    return cur.select(
        F.col(id_col),
        F.array(*[F.col(c) for c in code_cols]).alias("codes"),
    )


def rq_topk(
    codes_df: DataFrame,
    codebooks: DataFrame,
    query: DataFrame,
    dims: int,
    k: int = 10,
    id_col: str = "vec_id",
    codes_col: str = "codes",
    query_col: str = "q",
    round_decimals: int = 4,
) -> DataFrame:
    """ADC top-k over an RQ-encoded corpus (2-stage layout): per
    corpus row, the approximate cosine of the ADDITIVE reconstruction
    ``c1 + c2`` against the query —

        sim = (q.c1 + q.c2) /
              (sqrt(|c1|^2 + |c2|^2 + 2 c1.c2) * |q|)

    — via O(1) positional lookups into TWO bounded broadcast tables:
    the per-(stage, cid) ``(dq, cc)`` table (2 k_sub entries) and the
    ``k_sub^2`` cross-dot table for the one term additivity does not
    separate. A code outside the codebook yields NULL sim (the
    foreign-codebook contract); top-k is TakeOrdered (sim desc, id
    asc). Only the 2-stage form is served — deeper chains compose as
    shortlist + :func:`rq_rerank_topk`'s exact stage anyway."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    # shared bounded validation (coverage, density, centroid width):
    # rq_topk serves the 2-stage layout — deeper chains compose as
    # shortlist + exact re-rank anyway
    k_sub = _validate_rq_codebooks(codebooks, dims, n_levels=2)
    q = query.select(F.col(query_col).cast("array<double>").alias("qv"))
    probe = q.limit(2).collect()
    if len(probe) > 1:
        raise ValueError(
            "rq_topk expects exactly one query vector, got a multi-row "
            "query frame — issue one call per query"
        )
    if probe and probe[0]["qv"] is not None and len(probe[0]["qv"]) != dims:
        raise ValueError(
            f"query width {len(probe[0]['qv'])} != dims {dims} — a "
            "mismatched zip_with dot would NULL-pad into silently "
            "all-NULL sims"
        )
    if not probe:
        return codes_df.where(F.lit(False)).select(
            F.col(id_col), F.lit(None).cast("double").alias("sim")
        )
    # table 1: per (lvl, cid) -> (dq = q.c, cc = |c|^2), flat at
    # position lvl * k_sub + cid; plus |q| — ONE broadcast row
    tab = (
        codebooks.crossJoin(F.broadcast(q))
        .select(
            (F.col("lvl") * k_sub + F.col("cid")).alias("_idx"),
            _dot("c", "qv").alias("dq"),
            _dot("c", "c").alias("cc"),
            F.sqrt(_dot("qv", "qv")).alias("_qn"),
        )
        .agg(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("_idx", "dq", "cc"))
                ),
                lambda s: F.struct(s["dq"].alias("dq"), s["cc"].alias("cc")),
            ).alias("_tab"),
            F.max("_qn").alias("_qn"),
        )
    )
    # table 2: the k_sub^2 cross dots c1.c2, flat at cid1 * k_sub +
    # cid2 — the additive reconstruction's non-separable term
    c0 = codebooks.where(F.col("lvl") == 0).select(
        F.col("cid").alias("_c1"), F.col("c").alias("_ca")
    )
    c1 = codebooks.where(F.col("lvl") == 1).select(
        F.col("cid").alias("_c2"), F.col("c").alias("_cb")
    )
    cross = (
        c0.crossJoin(c1)
        .select(
            (F.col("_c1") * k_sub + F.col("_c2")).alias("_idx"),
            _dot("_ca", "_cb").alias("x"),
        )
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("_idx", "x"))),
                lambda s: s["x"],
            ).alias("_xs")
        )
    )
    code0 = F.get(F.col(codes_col), 0)
    code1 = F.get(F.col(codes_col), 1)
    # every lookup bound in ONE select before the sim expression
    # references them (CollapseProject)
    with_lk = (
        codes_df.select(F.col(id_col), F.col(codes_col))
        .crossJoin(F.broadcast(tab))
        .crossJoin(F.broadcast(cross))
        .select(
            F.col(id_col),
            F.get(F.col("_tab"), code0).alias("_t0"),
            F.get(F.col("_tab"), F.lit(k_sub) + code1).alias("_t1"),
            F.get(F.col("_xs"), code0 * k_sub + code1).alias("_x"),
            F.col("_qn"),
        )
    )
    # clamp: unlike PQ's recon (a sum of non-negative cc terms), the
    # additive |c1 + c2|^2 is computed by CANCELLATION (cc0 + cc1 +
    # 2x with x possibly ~ -(cc0+cc1)/2) and can round to a tiny
    # NEGATIVE — sqrt would then yield NaN, which sorts FIRST under
    # desc ordering and would TOP the k instead of ranking last
    recon_sq = F.greatest(
        with_lk["_t0"]["cc"] + with_lk["_t1"]["cc"] + 2.0 * F.col("_x"),
        F.lit(0.0),
    )
    sim = F.round(
        F.try_divide(
            with_lk["_t0"]["dq"] + with_lk["_t1"]["dq"],
            F.sqrt(recon_sq) * F.col("_qn"),
        ),
        round_decimals,
    )
    return (
        with_lk.select(F.col(id_col), sim.alias("sim"))
        .orderBy(F.col("sim").desc(), F.col(id_col))
        .limit(k)
    )


def rq_rerank_topk(
    codes_df: DataFrame,
    codebooks: DataFrame,
    vectors_df: DataFrame,
    query: DataFrame,
    dims: int,
    k: int = 10,
    shortlist_n: int = 100,
    id_col: str = "vec_id",
    codes_col: str = "codes",
    vec_col: str = "embedding",
    query_col: str = "q",
) -> DataFrame:
    """The two-stage RQ deployment contract: ADC shortlist over the
    additive codes, exact round-4 cosine over the shortlisted ids'
    float vectors — the same :func:`..pq._exact_rerank` stage the PQ
    paths share (one definition, serve paths cannot diverge)."""
    _validate_shortlist(shortlist_n, k)
    shortlist = rq_topk(
        codes_df,
        codebooks,
        query,
        dims=dims,
        k=shortlist_n,
        id_col=id_col,
        codes_col=codes_col,
        query_col=query_col,
    )
    return _exact_rerank(
        shortlist, vectors_df, query, k, id_col, vec_col, query_col
    )


def rq_ivf_topk_served(
    codes_df: DataFrame,
    codebooks: DataFrame,
    coarse_centroids: DataFrame,
    query: DataFrame,
    dims: int,
    k: int = 10,
    n_probe: int = 2,
    id_col: str = "vec_id",
    codes_col: str = "codes",
    query_col: str = "q",
) -> DataFrame:
    """The IVF-RQ serve path (the residual-quantization twin of
    :func:`..pq.pq_ivf_topk_served`): coarse IVF probe over the
    bounded float centroids (cosine, the package's standard probe
    rule) -> ONE literal ``cid IN (...)`` predicate that
    partition-prunes the RQ code lists at the scan -> additive-ADC
    re-rank inside the probed lists only (:func:`rq_topk`).

    ``codes_df`` is the materialized ``(id, codes, cid)`` frame —
    encode with :func:`rq_encode`, attach the coarse cid from
    :func:`..similarity.ivf_assign`, write partitioned by ``cid``
    (the served-index v5 ``rq_codes/`` layout). At 100 TB a probe
    reads ``n_probe/k_coarse`` of the corpus at ``n_levels`` code
    ints per vector — the two pruning levers multiply. Empty
    centroid frame or empty query -> empty result (the float twin's
    contract)."""
    from dgraph_dbpedia_spark.operators.similarity import _probe_single

    q = query.select(F.col(query_col).cast("array<double>").alias("qv"))
    probes = _probe_single(
        coarse_centroids.select(
            "cid", F.col("c").cast("array<double>").alias("c")
        ),
        q.select(F.col("qv")),
        n_probe,
        "rq_ivf_topk_served",
    )
    if not probes:
        return codes_df.where(F.lit(False)).select(
            F.col(id_col), F.lit(None).cast("double").alias("sim")
        )
    pruned = codes_df.where(F.col("cid").isin(probes))
    return rq_topk(
        pruned,
        codebooks,
        query,
        dims=dims,
        k=k,
        id_col=id_col,
        codes_col=codes_col,
        query_col=query_col,
    )
