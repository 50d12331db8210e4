"""A/B: the composed curation rows (curation_pipeline /
pretraining_prep registry rows) with dedup_corpus's default
label-propagation clusterer vs dedup_clusters_star (VERDICT r16 #3).

Both clusterers share the output contract — (doc_id, cluster_id) with
cluster_id = min doc id per connected component — so the composed rows'
results are identical by construction; this script measures whether the
star contraction's O(log^2 n) round count beats label propagation's
diameter+1 rounds on the banded-minhash quasi-clique graphs the
curation chain produces, at bench scale.

Usage: python tools/ab_star_clusterer.py [--iters N]
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

GOPHER = dict(
    min_words=25, max_words=100_000, min_mean_word_len=2.0,
    max_mean_word_len=12.0, min_alpha_word_ratio=0.8, min_stopwords=1,
)
KNOBS = dict(
    gopher_kwargs=GOPHER, near_dup_threshold=0.4, w=3, k=16, bands=4,
    decontaminate_w=4, alpha=0.5, seed=2,
)
PREP_KNOBS = dict(
    chunk_tokens=32, overlap=8,
    fractions={"train": 0.8, "val": 0.1, "test": 0.1},
    split_seed=1, epoch=3, n_shards=4,
)


def main() -> None:
    iters = 3
    if "--iters" in sys.argv:
        iters = int(sys.argv[sys.argv.index("--iters") + 1])
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = build_session(app_name="ab-star-clusterer")
    spark.sparkContext.setLogLevel("ERROR")

    from dgraph_dbpedia_spark.operators.cachectl import release
    from dgraph_dbpedia_spark.operators.dedup import dedup_clusters_star
    from dgraph_dbpedia_spark.plans.curate import curate_corpus, pretraining_prep

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    bench = docs.where(F.col("doc_id") % 50 == 0)
    corpus = docs.where(F.col("doc_id") % 50 != 0)

    def cur_default():
        return curate_corpus(corpus, benchmark=bench, **KNOBS).select(
            "doc_id", "lang", "source"
        )

    def cur_star():
        return curate_corpus(
            corpus, benchmark=bench, clusterer=dedup_clusters_star, **KNOBS
        ).select("doc_id", "lang", "source")

    def prep_default():
        return pretraining_prep(corpus, benchmark=bench, **KNOBS, **PREP_KNOBS)

    def prep_star():
        return pretraining_prep(
            corpus, benchmark=bench, clusterer=dedup_clusters_star,
            **KNOBS, **PREP_KNOBS,
        )

    variants = [
        ("curation_default", cur_default),
        ("curation_star", cur_star),
        ("prep_default", prep_default),
        ("prep_star", prep_star),
    ]
    out: dict[str, dict] = {}
    for name, fn in variants:
        samples = []
        for i in range(iters + 1):
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            res = fn()
            res.write.format("noop").mode("overwrite").save()
            dt = round(time.perf_counter() - t0, 3)
            release(res)
            if i:  # first pass = warm-up
                samples.append(dt)
        out[name] = {"best": min(samples), "samples": samples}

    # value identity spot-check: star vs default survivors must match
    spark.catalog.clearCache()
    a = cur_default().sort("doc_id").collect()
    b = cur_star().sort("doc_id").collect()
    out["curation_rows_equal"] = a == b
    print(json.dumps({"sf_dir": sf_dir, "results": out}))
    spark.stop()


if __name__ == "__main__":
    main()
