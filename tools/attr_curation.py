"""Stage attribution for the curation_pipeline query (VERDICT r10 #5):
time cumulative prefixes of the curate_corpus chain at bench scale so
the 5+ s warm cost decomposes into per-stage deltas, plus a
tokenize-only floor to bound how much of the chain is (re)tokenization.

Prefixes mirror plans/curate.py stage-for-stage (same knobs as the
`curation_pipeline` registry row); each prefix is a FRESH plan
materialized via a noop write (all columns evaluated), warm best-of-N
after one untimed warm-up, caches cleared between runs.

Usage: python tools/attr_curation.py [--iters N]   (sf via
$SPARK_GRAFT_SF_DIR, default /root/testdata/sf0.1)
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


def main() -> None:
    iters = 3
    if "--iters" in sys.argv:
        iters = int(sys.argv[sys.argv.index("--iters") + 1])
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = build_session(app_name="attr-curation")
    spark.sparkContext.setLogLevel("ERROR")

    from dgraph_dbpedia_spark.functions.hashing import tokens
    from dgraph_dbpedia_spark.operators.cachectl import release
    from dgraph_dbpedia_spark.operators.dedup import (
        decontaminate,
        dedup_corpus,
        exact_dedup,
        minhash_dedup_pairs,
    )
    from dgraph_dbpedia_spark.operators.sampling import temperature_sample
    from dgraph_dbpedia_spark.operators.textstats import (
        gopher_quality_filter,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    bench = docs.where(F.col("doc_id") % 50 == 0)
    corpus = docs.where(F.col("doc_id") % 50 != 0)

    def s1(c):
        gk = (
            gopher_quality_filter(c, **GOPHER)
            .where(F.col("keep"))
            .select("doc_id")
        )
        return c.join(gk, "doc_id", "left_semi")

    def s2(c):
        x = s1(c)
        reps = exact_dedup(x).select("doc_id")
        return x.join(reps, "doc_id", "left_semi")

    def s3(c):
        from dgraph_dbpedia_spark.operators.cachectl import tag_persisted

        x = s2(c).persist()
        pairs = minhash_dedup_pairs(x, w=3, k=16, bands=4, threshold=0.4)
        try:
            out = dedup_corpus(x, pairs.select("a", "b"))
        finally:
            release(pairs)
        # x stays cached THROUGH the caller's timed materialization
        # (the representative semi-join reads it); unpersisting here
        # would make the timed write re-run the s1/s2 lineage cold —
        # work the real chain never pays. The caller's release(res)
        # frees it via the handle.
        return tag_persisted(out, x)

    def s4(c):
        return decontaminate(s3(c), bench, w=4, bench_text_col="text")

    def s5(c):
        return temperature_sample(s4(c), group_col="lang", alpha=0.5, seed=2)

    def tok_only(c):
        return c.select(
            "doc_id", F.size(tokens(F.col("text"))).alias("n")
        )

    stages = [
        ("tokenize_only", tok_only),
        ("s1_gopher", s1),
        ("s2_exact", s2),
        ("s3_neardup", s3),
        ("s4_decontaminate", s4),
        ("s5_temperature", s5),
    ]
    out: dict[str, dict] = {}
    for name, fn in stages:
        samples = []
        for i in range(iters + 1):
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            res = fn(corpus)
            res.write.format("noop").mode("overwrite").save()
            dt = round(time.perf_counter() - t0, 3)
            release(res)
            if i:  # first pass = warm-up
                samples.append(dt)
        out[name] = {"best": min(samples), "samples": samples}
    prev = 0.0
    for name, _ in stages:
        if name == "tokenize_only":
            continue
        out[name]["delta_vs_prev_stage"] = round(
            out[name]["best"] - prev, 3
        )
        prev = out[name]["best"]
    print(json.dumps({"sf_dir": sf_dir, "stages": out}))
    spark.stop()


if __name__ == "__main__":
    main()
