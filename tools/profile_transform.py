"""Phase-level wall-clock breakdown of the transform pipeline at bench
scale. Wraps the sink functions with timers (per-sink start/stop on the
pool threads) to show where transform_sec goes.

Usage: python tools/profile_transform.py [n_subjects] [--iters N]

``--iters N`` (default 1, r16): one untimed warm-up transform, then N
timed runs; the spans of the BEST run are reported. A single cold run
is machine-state-dominated (r16: 98 s cold vs 23-26 s warm on the
same binary the same hour) — the pipeline bench damps this with
warm-up + best-of-4, and profiles must be damped the same way to be
comparable across sessions.
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
    argv = sys.argv[1:]
    iters = 1
    if "--iters" in argv:
        i = argv.index("--iters")
        iters = int(argv[i + 1])
        argv = argv[:i] + argv[i + 2:]
    n_subjects = int(argv[0]) if argv else 60_000
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
        best: tuple[float, list] | None = None
        runs = ([False] if iters == 1 else [False] + [True] * iters)
        for timed in runs:
            spans.clear()
            t0[0] = time.perf_counter()
            T.transform(spark, f"{work}/parquet", f"{work}/rdf",
                        languages=list(LANGS), cfg=cfg)
            total = time.perf_counter() - t0[0]
            label = "timed" if timed or iters == 1 else "warm-up"
            print(f"run ({label}): {total:.2f}s")
            if (timed or iters == 1) and (best is None or total < best[0]):
                best = (total, list(spans))
        total, best_spans = best
        print(f"TOTAL transform: {total:.2f}s  (subjects={n_subjects}, "
              f"best of {max(iters, 1)} after "
              f"{'1 warm-up' if iters > 1 else 'no warm-up'})")
        for name, s, e in sorted(best_spans, key=lambda x: x[1]):
            print(f"  {name:28s} start={s:6.2f}  end={e:6.2f}  dur={e - s:6.2f}")
    finally:
        T.write_rdf, T.write_schema = real_write_rdf, real_write_schema
        shutil.rmtree(work, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
