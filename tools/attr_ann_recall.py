"""Stage attribution for the ann_recall_report row's 4x sample
variance (VERDICT r13 #5): time each arm of the composition separately
under the bench's clearCache discipline, plus the index-ensure call
itself, to name where the seconds go — the corpus is 2000 vectors at
sf0.1, so any multi-second cost is fixed overhead (plan compile,
index checks, driver work), not data volume.

Usage: python tools/attr_ann_recall.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry
from dgraph_dbpedia_spark.session import build_session
from pyspark.sql import functions as F


def timed(label: str, fn, n: int = 3, clear=None) -> list[float]:
    out = []
    for _ in range(n):
        if clear is not None:
            clear()
        t0 = time.perf_counter()
        fn()
        out.append(round(time.perf_counter() - t0, 3))
    print(f"{label:42s} {out}")
    return out


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = build_session(app_name="attr-ann-recall")
    spark.sparkContext.setLogLevel("ERROR")

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    # 1. the index-ensure call (bench pre-builds it; a COMPLETE root
    #    should make this near-zero)
    timed("_served_ivf_index (ensure+read)", lambda: entry._served_ivf_index(spark, sf_dir))

    emb = entry._t(spark, sf_dir, "embeddings")
    from dgraph_dbpedia_spark.operators.similarity import (
        cosine_topk,
        ivf_topk_served,
    )

    q = emb.where(F.col("vec_id") == 0).select(F.col("embedding").alias("q"))

    # 2. one brute arm
    def brute():
        noop(cosine_topk(emb.where(F.col("vec_id") > 0), q, k=5))

    timed("brute cosine arm (noop)", brute, clear=spark.catalog.clearCache)

    # 3. one served arm
    assigned, centroids = entry._served_ivf_index(spark, sf_dir)

    def served():
        noop(ivf_topk_served(assigned, centroids, q, k=5, n_probe=2))

    timed("served IVF arm (noop)", served, clear=spark.catalog.clearCache)

    # 4. the full registered row, bench-style
    qs = entry.queries()

    def full():
        noop(qs["ann_recall_report"](spark, sf_dir))

    timed("full ann_recall_report (noop)", full, clear=spark.catalog.clearCache)

    spark.stop()


if __name__ == "__main__":
    main()
