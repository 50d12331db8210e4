"""Same-session A/B of the Arrow centroid-assignment kernel (r10
prescription #1): semantic_dedup / ivf_train / ivf_topk with
use_arrow=False (native higher-order fold) vs True (numpy Arrow
kernel), warm-up pass first, best-of-2 per variant, at
$SPARK_GRAFT_SF_DIR (default sf0.1).

Usage: python tools/ab_arrow_assign.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from dgraph_dbpedia_spark.session import build_session


def timed(fn, n=2):
    best = float("inf")
    samples = []
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        dt = round(time.perf_counter() - t0, 3)
        samples.append(dt)
        best = min(best, dt)
    return best, samples


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    spark = build_session(app_name="ab-arrow-assign")
    from dgraph_dbpedia_spark.operators.similarity import (
        ivf_topk,
        ivf_train,
        semantic_dedup,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    query = emb.orderBy("vec_id").limit(1).select(
        F.col("embedding").alias("q")
    )

    # warm both lanes (JIT + Arrow worker pool) on a slice
    small = emb.limit(256)
    for ua in (False, True):
        semantic_dedup(small, threshold=0.4, n_centroids=4, use_arrow=ua)\
            .write.format("noop").mode("overwrite").save()
    spark.catalog.clearCache()

    out = {"sf_dir": sf_dir}
    for name, mk in [
        (
            "semantic_dedup",
            lambda ua: lambda: semantic_dedup(
                emb, threshold=0.40, n_centroids=16, use_arrow=ua
            ).select("vec_id", "label").write.format("noop")
            .mode("overwrite").save(),
        ),
        (
            "ivf_train",
            lambda ua: lambda: ivf_train(
                emb, n_centroids=8, n_iter=2, use_arrow=ua
            ).write.format("noop").mode("overwrite").save(),
        ),
        (
            "ivf_topk",
            lambda ua: lambda: ivf_topk(
                emb.where(F.col("vec_id") > 0), query, k=5,
                n_centroids=16, n_probe=2, use_arrow=ua,
            ).write.format("noop").mode("overwrite").save(),
        ),
    ]:
        res = {}
        for ua, label in [(False, "native"), (True, "arrow")]:
            best, samples = timed(mk(ua))
            spark.catalog.clearCache()
            res[label] = {"best": best, "samples": samples}
        res["speedup"] = round(res["native"]["best"] / res["arrow"]["best"], 2)
        out[name] = res
        print(json.dumps({name: res}))
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
