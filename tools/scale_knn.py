"""Blocked k-NN label-noise scale point: synthetic labeled vectors in
well-separated label clusters (cluster centers from the deterministic
md5 plane family, per-vector jitter hash-derived) with a fraction of
PLANTED mislabels (a vector sitting in cluster c but carrying label
(c+1) % n_labels). Measures the knn_label_noise_report chain at a
corpus size where the exact O(n^2) pair scan is infeasible: candidate
pairs from an IVF cid equi-join over trained centroids (the
registered row's shape), Arrow pair scoring, rank + vote, and reports
wall-clock plus planted-mislabel detection recall (a planted row's
cluster-mates out-vote its wrong label, so it should be counted
suspect; detection = the per-label suspect counts attribute ~all
planted rows).

Blocking uses the adaptive k_centroids ~ sqrt(n) rule (the SemDeDup
sizing the text-dedup rows use), so the pair volume is ~n^1.5 — the
property that makes the audit runnable where exact n^2 is not.

Usage: python tools/scale_knn.py [n] [n_labels] [planted_frac_pct] [dims] [k] [n_centroids] [block|pairs]
Prints ONE JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from dgraph_dbpedia_spark.session import build_session


def main() -> None:
    import math

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000
    n_labels = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    planted_pct = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    dims = int(sys.argv[4]) if len(sys.argv) > 4 else 64
    k = int(sys.argv[5]) if len(sys.argv) > 5 else 5
    n_cent = (
        int(sys.argv[6])
        if len(sys.argv) > 6
        else max(16, 2 ** math.ceil(math.log2(max(n, 4)) / 2))
    )
    spark = build_session(app_name="scale-knn")
    spark.sparkContext.setLogLevel("ERROR")

    from dgraph_dbpedia_spark.operators.similarity import (
        _plane_literal,
        ivf_assign,
        ivf_seed_centroids,
        knn_label_noise_report,
    )

    # label cluster centers: rows of the deterministic plane matrix
    # (unit-ish, well separated); per-vector jitter = a small second
    # plane-family perturbation keyed by the id, so every vector sits
    # firmly inside its cluster (intra-cluster cosine >> inter)
    centers = _plane_literal(n_labels, dims)
    jitter = _plane_literal(64, dims)
    base = spark.range(n).select(
        F.col("id").alias("vec_id"),
        (F.col("id") % n_labels).cast("int").alias("true_label"),
    )
    emb = base.select(
        "vec_id",
        "true_label",
        F.zip_with(
            F.slice(centers, (F.col("true_label") * dims + 1), dims),
            F.slice(jitter, ((F.col("vec_id") % 64) * dims + 1).cast("int"), dims),
            lambda c, j: c + 0.05 * j,
        ).alias("embedding"),
    )
    # plant mislabels on a deterministic id slice
    step = 100 // planted_pct
    labeled = emb.select(
        "vec_id",
        "embedding",
        F.when(
            F.col("vec_id") % step == 0,
            ((F.col("true_label") + 1) % n_labels).cast("int"),
        )
        .otherwise(F.col("true_label"))
        .cast("int")
        .alias("label"),
        (F.col("vec_id") % step == 0).alias("planted"),
    ).localCheckpoint()
    n_planted = labeled.where("planted").count()

    e = labeled.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("e")
    )
    lane = sys.argv[7] if len(sys.argv) > 7 else "block"
    t0 = time.perf_counter()
    cent = ivf_seed_centroids(e, n_cent, vec_col="e")
    asg = ivf_assign(e, cent, vec_col="e").select("vec_id", "cid")
    if lane == "block":
        # the efficient same-block structure: one kernel per block,
        # vectors cross Arrow once (pinned equal to the pair lane)
        report = knn_label_noise_report(labeled, k=k, block_assign=asg)
    else:
        pairs = (
            asg.select(F.col("vec_id").alias("qid"), "cid")
            .join(asg.select(F.col("vec_id").alias("nid"), "cid"), "cid")
            .drop("cid")
        )
        report = knn_label_noise_report(labeled, k=k, candidate_pairs=pairs)
    rows = report.collect()
    chain_s = round(time.perf_counter() - t0, 2)

    n_suspect = sum(r["n_suspect"] for r in rows)
    out = {
        "n": n,
        "n_labels": n_labels,
        "n_centroids": n_cent,
        "dims": dims,
        "k": k,
        "lane": lane,
        "n_planted": n_planted,
        "n_suspect_total": n_suspect,
        "suspect_over_planted": round(n_suspect / max(n_planted, 1), 3),
        "chain_sec": chain_s,
        "rows_per_sec": round(n / chain_s),
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
