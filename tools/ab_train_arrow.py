"""A/B the r12 Arrow training-assignment lane (pq_train/rq_train
``use_arrow``) at the standard 200k synthetic scale point, same
hash-derived uniform vectors as tools/scale_pq.py / scale_rq.py.

Three experiments, one JSON line each to stdout:

1. pq_train m=8 k_sub=32 n_iter=1 — native vs Arrow wall-clock
   (the fused-trainer baseline BENCH_SCALE r12 recorded at 15.1 s);
2. rq_train k_sub=32 n_levels=2 n_iter=1 — native vs Arrow
   (147.7 s native at this setting in BENCH_SCALE r12);
3. rq_train k_sub=256 — ARROW ONLY (the native full-dim fold made no
   visible progress in 20 minutes at this setting and was killed;
   that finding is the lane's reason to exist). Pass --native-256 to
   try the native side anyway with a wall-clock budget you accept.

Usage: python tools/ab_train_arrow.py [n] [dims]
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
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    dims = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    spark = build_session(app_name="ab-train-arrow")
    spark.sparkContext.setLogLevel("ERROR")

    from dgraph_dbpedia_spark.functions.hashing import hash64
    from dgraph_dbpedia_spark.operators.pq import pq_train
    from dgraph_dbpedia_spark.operators.rq import rq_train

    def vec(idc):
        return F.array(*[
            (
                F.pmod(
                    hash64(
                        F.concat(idc.cast("string"), F.lit(f":{d}")), seed=7
                    ),
                    F.lit(1_000_000),
                )
                / 500_000.0
                - 1.0
            )
            for d in range(dims)
        ])

    corpus = (
        spark.range(n)
        .select(F.col("id").alias("vec_id"), vec(F.col("id")).alias("embedding"))
        .localCheckpoint()
    )

    def run(tag, fn, check_equal_to=None):
        t0 = time.perf_counter()
        cb = fn()
        rows = sorted(map(tuple, cb.collect()))
        sec = round(time.perf_counter() - t0, 2)
        out = {"exp": tag, "sec": sec, "rows": len(rows)}
        if check_equal_to is not None:
            out["bit_equal_to_native"] = rows == check_equal_to
        print(json.dumps(out), flush=True)
        return rows

    nat = run(
        "pq_train m8 k32 native",
        lambda: pq_train(
            corpus, dims, m=8, k_sub=32, n_iter=1, use_arrow=False
        ),
    )
    run(
        "pq_train m8 k32 arrow",
        lambda: pq_train(
            corpus, dims, m=8, k_sub=32, n_iter=1, use_arrow=True
        ),
        check_equal_to=nat,
    )
    nat = run(
        "rq_train k32 L2 native",
        lambda: rq_train(
            corpus, dims, k_sub=32, n_levels=2, n_iter=1, use_arrow=False
        ),
    )
    run(
        "rq_train k32 L2 arrow",
        lambda: rq_train(
            corpus, dims, k_sub=32, n_levels=2, n_iter=1, use_arrow=True
        ),
        check_equal_to=nat,
    )
    run(
        "rq_train k256 L2 arrow",
        lambda: rq_train(
            corpus, dims, k_sub=256, n_levels=2, n_iter=1, use_arrow=True
        ),
    )
    if "--native-256" in sys.argv:
        run(
            "rq_train k256 L2 native",
            lambda: rq_train(
                corpus, dims, k_sub=256, n_levels=2, n_iter=1,
                use_arrow=False,
            ),
        )
    spark.stop()


if __name__ == "__main__":
    main()
