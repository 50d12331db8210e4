"""Phase-level wall-clock breakdown of the transform pipeline at bench
scale. Wraps the sink functions with timers (per-sink start/stop on the
pool threads) to show where transform_sec goes.

Usage: python tools/profile_transform.py [n_subjects]
"""

from __future__ import annotations

import os
import sys
import tempfile
import shutil
import time

sys.path.insert(0, "/root/repo")

from dgraph_dbpedia_spark.session import build_session
from dgraph_dbpedia_spark.benchgen import generate_ttl_corpus, LANGS
from dgraph_dbpedia_spark.plans.ingest import ingest
from dgraph_dbpedia_spark.plans import transform as T


def main() -> None:
    n_subjects = int(sys.argv[1]) if len(sys.argv) > 1 else 60_000
    spark = build_session(app_name="profile-transform")
    spark.sparkContext.setLogLevel("ERROR")
    work = tempfile.mkdtemp(prefix="sparkgraft-prof-")
    spans: list[tuple[str, float, float]] = []
    t0 = [0.0]

    real_write_rdf, real_write_schema = T.write_rdf, T.write_schema

    def timed_write_rdf(spark, df, path, *args, **kwargs):
        s = time.perf_counter() - t0[0]
        out = real_write_rdf(spark, df, path, *args, **kwargs)
        e = time.perf_counter() - t0[0]
        spans.append((os.path.basename(path), s, e))
        return out

    def timed_write_schema(df, path, indexed):
        s = time.perf_counter() - t0[0]
        real_write_schema(df, path, indexed)
        e = time.perf_counter() - t0[0]
        spans.append((os.path.basename(path), s, e))

    T.write_rdf = timed_write_rdf
    T.write_schema = timed_write_schema

    try:
        generate_ttl_corpus(spark, f"{work}/ttl", n_subjects)
        ingest(spark, f"{work}/ttl", f"{work}/parquet", print_stats=False)

        cfg = T.TransformConfig(
            write_types=True, externalise_uris=True,
            remove_language_tags=True,
            top_infobox_properties_per_lang=100, print_stats=False,
        )
        t0[0] = time.perf_counter()
        T.transform(spark, f"{work}/parquet", f"{work}/rdf",
                    languages=list(LANGS), cfg=cfg)
        total = time.perf_counter() - t0[0]
        print(f"TOTAL transform: {total:.2f}s  (subjects={n_subjects})")
        for name, s, e in sorted(spans, key=lambda x: x[1]):
            print(f"  {name:28s} start={s:6.2f}  end={e:6.2f}  dur={e - s:6.2f}")
    finally:
        T.write_rdf, T.write_schema = real_write_rdf, real_write_schema
        shutil.rmtree(work, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
