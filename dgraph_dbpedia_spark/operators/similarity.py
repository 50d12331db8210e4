"""Similarity search over embedding columns (``array<float>``).

Extension surface (SURVEY §7.8). Two paths:

- ``cosine_topk``  — brute-force exact top-k against a query vector.
  Correctness baseline; per-row native arithmetic (zip_with/aggregate),
  a broadcast of the query, and a top-k. At scale this is a single scan:
  fine whenever k << n and the scan is the cost floor anyway.
- ``lsh_bucketed_topk`` — random-hyperplane LSH: sign-bit sketch per
  vector -> candidates share a bucket -> exact re-rank inside buckets.
  The scale path: the equi-join on buckets replaces the full scan per
  query with a bucket lookup; probing nearby buckets (multi-probe)
  trades recall for cost.
- ``cosine_near_dup_pairs`` — all-pairs variant for embedding near-dup
  detection, LSH-bucketed so the join is sparse.

Hyperplanes are deterministic pseudo-random unit-free vectors derived
from the cross-engine hash (functions/hashing.py) — no RNG state, same
result every run and every engine.
"""

from __future__ import annotations

from functools import lru_cache

import pandas as pd  # module-level: pandas_udf type hints must resolve
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from dgraph_dbpedia_spark.functions.hashing import hash64


def _dot(a: Column | str, b: Column | str) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def _norm(a: Column | str) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine(a: Column | str, b: Column | str) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def cosine_topk(
    df: DataFrame,
    query: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_col: str = "q",
) -> DataFrame:
    """Exact top-k by cosine against a 1-row query frame (broadcast).
    Deterministic tie-break on id. Returns ``(id, sim)``."""
    cand = df.select(F.col(id_col), F.col(vec_col).cast("array<double>").alias("e"))
    q = query.select(F.col(query_col).cast("array<double>").alias("q"))
    scored = cand.crossJoin(F.broadcast(q)).select(
        F.col(id_col), F.round(cosine("e", "q"), 4).alias("sim")
    )
    return scored.orderBy(F.col("sim").desc(), F.col(id_col)).limit(k)


def plane_values(n_planes: int, dims: int) -> list[float]:
    """Deterministic pseudo-random hyperplane coefficients in [-1, 1),
    flattened row-major (plane p occupies [p*dims, (p+1)*dims)). Derived
    from the cross-engine md5 hash of ``"p:d"`` so oracles can recompute
    them bit-identically."""
    from dgraph_dbpedia_spark.functions.hashing import hash64_py

    scale = float(1 << 59)
    return [
        hash64_py(f"{p}:{d}") / scale - 1.0
        for p in range(n_planes)
        for d in range(dims)
    ]


@lru_cache(maxsize=None)
def _plane_literal(n_planes: int, dims: int) -> Column:
    """The flattened plane array as ONE SQL-parsed array literal.
    ``F.lit(<python list>)`` converts element-by-element over py4j —
    measured 0.84s of driver time for 8x64 planes, per call site; the
    SQL string parses JVM-side in ~5ms. Memoized (pure expression,
    reusable across plans) because every query/corpus pair builds the
    same literal twice."""
    vals = plane_values(n_planes, dims)
    return F.expr("array(" + ",".join(repr(v) + "D" for v in vals) + ")")


def hyperplane_signs(vec: Column, n_planes: int, dims: int) -> Column:
    """Sign-bit sketch: bit p = 1 iff ``vec . h_p > 0``. Returns an int64
    bucket id (n_planes bits).

    The planes ship as ONE flattened array literal and the double loop
    runs inside two nested higher-order aggregates — constant-size
    expression tree, so codegen stays small no matter how many planes/
    dims (the naive unrolled form is n_planes*dims literal nodes and
    minutes of codegen at 8x64)."""
    flat = _plane_literal(n_planes, dims)

    def proj(p: Column) -> Column:
        return F.aggregate(
            F.sequence(F.lit(0), F.lit(dims - 1)),
            F.lit(0.0),
            lambda acc, d: acc
            + F.element_at(vec, d + 1) * F.element_at(flat, p * dims + d + 1),
        )

    return F.aggregate(
        F.sequence(F.lit(0), F.lit(n_planes - 1)),
        F.lit(0).cast("long"),
        lambda acc, p: acc
        + F.when(proj(p) > 0, F.pow(F.lit(2.0), p).cast("long")).otherwise(
            F.lit(0).cast("long")
        ),
    )


def lsh_bucketed_topk(
    df: DataFrame,
    query: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_col: str = "q",
    n_planes: int = 8,
    dims: int = 64,
) -> DataFrame:
    """ANN: restrict the exact re-rank to vectors sharing the query's
    LSH bucket. Recall < 1 by construction; raise n_planes for finer
    buckets or probe more buckets for recall."""
    cand = df.select(
        F.col(id_col),
        F.col(vec_col).cast("array<double>").alias("e"),
        hyperplane_signs(F.col(vec_col).cast("array<double>"), n_planes, dims).alias(
            "bucket"
        ),
    )
    q = query.select(
        F.col(query_col).cast("array<double>").alias("q"),
        hyperplane_signs(F.col(query_col).cast("array<double>"), n_planes, dims).alias(
            "bucket"
        ),
    )
    scored = cand.join(F.broadcast(q), "bucket").select(
        F.col(id_col), F.round(cosine("e", "q"), 4).alias("sim")
    )
    return scored.orderBy(F.col("sim").desc(), F.col(id_col)).limit(k)


def cosine_topk_arrow(
    df: DataFrame,
    query: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_col: str = "q",
) -> DataFrame:
    """Production twin of :func:`cosine_topk`: the scoring loop runs as
    an Arrow-batched pandas UDF (numpy matrix-vector product per batch)
    instead of interpreted higher-order array expressions — the
    vectorized path for wide embeddings at 100 TB, at the price of one
    Python stage (so not part of the JVM-only oracle surface).

    Same contract and tie-break as cosine_topk; results match to float
    rounding."""
    import numpy as np
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import DoubleType

    q_vec = [float(x) for x in query.first()[0]]

    def score_batch(emb: pd.Series) -> pd.Series:
        q = np.asarray(q_vec, dtype=np.float64)
        qn = np.sqrt(q @ q)
        mat = np.asarray(emb.tolist(), dtype=np.float64)
        sims = (mat @ q) / (np.sqrt((mat * mat).sum(axis=1)) * qn)
        return pd.Series(np.round(sims, 4))

    # real class objects (not string hints) in the signature: pyspark
    # resolves the eval type by inspecting the annotations
    score = pandas_udf(score_batch, DoubleType())

    scored = df.select(
        F.col(id_col), score(F.col(vec_col).cast("array<double>")).alias("sim")
    )
    return scored.orderBy(F.col("sim").desc(), F.col(id_col)).limit(k)


def ivf_assign(
    df: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "e",
) -> DataFrame:
    """Assign every vector to its nearest centroid by cosine (the IVF
    inverted lists). Deterministic tie-break: round(sim, 6) desc, then
    centroid id asc. Returns ``(id, vec, cid)``.

    Cost shape: |df| x |centroids| dot products via a broadcast
    nested-loop join — the standard IVF assignment cost; the windowed
    argmax partitions by vector id, so each vector's k candidate rows
    stay in one task."""
    from pyspark.sql import Window

    scored = df.crossJoin(F.broadcast(centroids)).select(
        F.col(id_col),
        F.col(vec_col),
        F.col("cid"),
        F.round(cosine(vec_col, "c"), 6).alias("csim"),
    )
    w = Window.partitionBy(id_col).orderBy(F.col("csim").desc(), F.col("cid"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(F.col(id_col), F.col(vec_col), "cid")
    )


def ivf_topk(
    df: DataFrame,
    query: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_col: str = "q",
    n_centroids: int = 16,
    n_probe: int = 2,
) -> DataFrame:
    """IVF (inverted-file) ANN: deterministic seed centroids (the
    ``n_centroids`` lowest-id vectors), one-pass nearest-centroid
    assignment, query probes its ``n_probe`` nearest lists, exact cosine
    re-rank inside the probed lists only.

    The scale path vs brute force: the full scan is replaced by reading
    ~n_probe/n_centroids of the data; the inverted lists are an
    equi-join key, so storage can be bucketed/partitioned by ``cid``
    and probing prunes partitions. Recall < 1 by construction; raise
    n_probe for recall, n_centroids for finer lists."""
    e = df.select(F.col(id_col), F.col(vec_col).cast("array<double>").alias("e"))
    centroids = (
        e.orderBy(id_col)
        .limit(n_centroids)
        .select(F.col(id_col).alias("cid"), F.col("e").alias("c"))
    )
    lists = ivf_assign(e, centroids, id_col, "e")

    q = query.select(F.col(query_col).cast("array<double>").alias("q"))
    probes = (
        centroids.crossJoin(F.broadcast(q))
        .select("cid", F.round(cosine("c", "q"), 6).alias("csim"))
        .orderBy(F.col("csim").desc(), F.col("cid"))
        .limit(n_probe)
        .select("cid")
    )
    cand = lists.join(F.broadcast(probes), "cid", "left_semi")
    scored = cand.crossJoin(F.broadcast(q)).select(
        F.col(id_col), F.round(cosine("e", "q"), 4).alias("sim")
    )
    return scored.orderBy(F.col("sim").desc(), F.col(id_col)).limit(k)


def cosine_near_dup_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    n_planes: int = 8,
    dims: int = 64,
) -> DataFrame:
    """All pairs with cosine >= threshold, LSH-bucketed: only vectors in
    the same bucket are compared (high-cosine pairs land together with
    probability (1 - theta/pi)^n_planes). Returns ``(a, b, sim)``."""
    # norms precomputed per VECTOR (n rows), not per pair (~n^2/buckets
    # rows): inside the bucket join only the dot product remains —
    # higher-order array aggregates run interpreted, so halving the
    # per-pair array passes matters
    # persisted: the sketch feeds both self-join sides — without it the
    # sign/norm computation runs twice (no cross-branch subplan sharing)
    sk = df.select(
        F.col(id_col),
        F.col(vec_col).cast("array<double>").alias("e"),
        _norm(F.col(vec_col).cast("array<double>")).alias("n"),
        hyperplane_signs(F.col(vec_col).cast("array<double>"), n_planes, dims).alias(
            "bucket"
        ),
    ).persist()
    a = sk.select(F.col(id_col).alias("a"), F.col("e").alias("ea"), F.col("n").alias("na"), "bucket")
    b = sk.select(F.col(id_col).alias("b"), F.col("e").alias("eb"), F.col("n").alias("nb"), "bucket")
    sim = F.round(_dot("ea", "eb") / (F.col("na") * F.col("nb")), 4)
    return (
        a.join(b, "bucket")
        .where(F.col("a") < F.col("b"))
        .select("a", "b", sim.alias("sim"))
        .where(F.col("sim") >= threshold)
        .distinct()
    )
