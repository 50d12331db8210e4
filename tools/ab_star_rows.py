"""A/B: the NON-composed registry rows that inherit dedup_corpus's
default clusterer — dedup_corpus, dedup_increment, semantic_dedup,
semantic_dedup_keep_far — with label propagation vs star contraction
(VERDICT r16 #3 follow-through: tools/ab_star_clusterer.py covers the
two composed curation rows; this covers the rest of the blast radius
so the default swap is measured on every affected row, not assumed).

Usage: python tools/ab_star_rows.py [--iters N]
(sf via $SPARK_GRAFT_SF_DIR, default /root/testdata/sf0.1)
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
    iters = 3
    if "--iters" in sys.argv:
        iters = int(sys.argv[sys.argv.index("--iters") + 1])
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = build_session(app_name="ab-star-rows")
    spark.sparkContext.setLogLevel("ERROR")

    from dgraph_dbpedia_spark.operators.cachectl import release
    from dgraph_dbpedia_spark.operators.dedup import (
        dedup_clusters,
        dedup_clusters_star,
        dedup_corpus,
        dedup_increment,
        minhash_dedup_pairs,
    )
    from dgraph_dbpedia_spark.operators.similarity import semantic_dedup

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")

    def corpus_row(clusterer):
        pairs = minhash_dedup_pairs(docs, w=3, k=16, bands=4, threshold=0.4)
        out = dedup_corpus(docs, pairs, clusterer=clusterer).select(
            "doc_id", "lang", "source"
        )
        release(pairs)
        return out

    def increment_row(clusterer):
        existing = docs.where(F.col("doc_id") % 4 != 0)
        batch = docs.where(F.col("doc_id") % 4 == 0)
        return dedup_increment(
            existing, batch, w=3, k=16, bands=4, threshold=0.4,
            clusterer=clusterer,
        ).select("doc_id", "lang", "source")

    def semantic_row(clusterer):
        return semantic_dedup(
            emb, threshold=0.40, n_centroids=16, clusterer=clusterer
        ).select("vec_id", "label")

    def keep_far_row(clusterer):
        return semantic_dedup(
            emb, threshold=0.40, n_centroids=16, keep="low_centroid_sim",
            clusterer=clusterer,
        ).select("vec_id", "label")

    rows = {
        "dedup_corpus": corpus_row,
        "dedup_increment": increment_row,
        "semantic_dedup": semantic_row,
        "semantic_dedup_keep_far": keep_far_row,
    }
    out: dict[str, dict] = {}
    for name, fn in rows.items():
        for tag, clusterer in (
            ("lp", dedup_clusters), ("star", dedup_clusters_star)
        ):
            samples = []
            for i in range(iters + 1):
                spark.catalog.clearCache()
                t0 = time.perf_counter()
                res = fn(clusterer)
                res.write.format("noop").mode("overwrite").save()
                dt = round(time.perf_counter() - t0, 3)
                release(res)
                if i:  # first pass = warm-up
                    samples.append(dt)
            out[f"{name}_{tag}"] = {"best": min(samples), "samples": samples}
        # value identity: the two clusterers must keep the same rows
        spark.catalog.clearCache()
        a = fn(dedup_clusters).sort(*fn(dedup_clusters).columns).collect()
        b = fn(dedup_clusters_star).sort(*fn(dedup_clusters_star).columns).collect()
        out[f"{name}_rows_equal"] = a == b
    print(json.dumps({"sf_dir": sf_dir, "results": out}))
    spark.stop()


if __name__ == "__main__":
    main()
