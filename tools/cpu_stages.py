"""Per-sink CPU attribution for the transform pipeline: run transform
at bench scale with a job-description set around every sink call, then
group executor CPU time by job description via the driver
AppStatusStore.

Usage: python tools/cpu_stages.py [n_subjects]
"""

from __future__ import annotations

import sys
import tempfile
import shutil
import time
from collections import defaultdict

sys.path.insert(0, "/root/repo")

from dgraph_dbpedia_spark.session import build_session
from dgraph_dbpedia_spark.benchgen import generate_ttl_corpus, LANGS
from dgraph_dbpedia_spark.plans.ingest import ingest
from dgraph_dbpedia_spark.plans import transform as T


def _stage_rows(spark):
    sc = spark.sparkContext
    store = sc._jsc.sc().statusStore()
    stages = store.stageList(
        sc._jvm.java.util.ArrayList(),
        False,
        False,
        sc._gateway.new_array(sc._jvm.double, 0),
        sc._jvm.java.util.ArrayList(),
    )
    rows = {}
    it = stages.iterator()
    while it.hasNext():
        s = it.next()
        rows[s.stageId()] = (s.executorCpuTime() / 1e9, s.executorRunTime() / 1e3,
                             s.numTasks(), (s.description().toString() if hasattr(s.description(), "toString") else str(s.description()))[:80])
    return rows


def main() -> None:
    n_subjects = int(sys.argv[1]) if len(sys.argv) > 1 else 600_000
    spark = build_session(app_name="cpu-stages")
    spark.sparkContext.setLogLevel("ERROR")
    work = tempfile.mkdtemp(prefix="sparkgraft-cpu-")

    # wrap the sink entry points with job-description scopes so every
    # stage lands in a named group (descriptions propagate to stages)
    real_write_rdf, real_write_schema = T.write_rdf, T.write_schema
    sc = spark.sparkContext

    def timed_write_rdf(spark_, df, path, *a, **kw):
        import os as _os
        sc.setJobDescription(f"sink:{_os.path.basename(path)}")
        try:
            return real_write_rdf(spark_, df, path, *a, **kw)
        finally:
            sc.setJobDescription(None)

    def timed_write_schema(df, path, indexed):
        import os as _os
        sc.setJobDescription(f"schema:{_os.path.basename(path)}")
        try:
            return real_write_schema(df, path, indexed)
        finally:
            sc.setJobDescription(None)

    T.write_rdf = timed_write_rdf
    T.write_schema = timed_write_schema
    try:
        generate_ttl_corpus(spark, f"{work}/ttl", n_subjects)
        ingest(spark, f"{work}/ttl", f"{work}/parquet", print_stats=False)
        pre = _stage_rows(spark)
        watermark = max(pre) if pre else -1
        pre_cpu = sum(r[0] for r in pre.values())

        cfg = T.TransformConfig(
            write_types=True, externalise_uris=True,
            remove_language_tags=True,
            top_infobox_properties_per_lang=100, print_stats=False,
        )
        t0 = time.perf_counter()
        T.transform(spark, f"{work}/parquet", f"{work}/rdf",
                    languages=list(LANGS), cfg=cfg)
        wall = time.perf_counter() - t0

        rows = _stage_rows(spark)
        tr = {sid: r for sid, r in rows.items() if sid > watermark}
        cpu = sum(r[0] for r in tr.values())
        print(f"transform wall {wall:.2f}s  CPU {cpu:.1f}s "
              f"({cpu / wall:.1f} cores avg)  pre-transform CPU {pre_cpu:.1f}s")
        groups = defaultdict(lambda: [0.0, 0.0, 0])
        for sid, (c, r, n, desc) in sorted(tr.items()):
            g = groups[desc or "<none>"]
            g[0] += c
            g[1] += r
            g[2] += 1
        for desc, (c, r, nst) in sorted(groups.items(), key=lambda kv: -kv[1][0]):
            print(f"  cpu={c:7.1f}s run={r:7.1f}s stages={nst:3d}  {desc}")
        print("top stages:")
        for sid, (c, r, n, desc) in sorted(tr.items(), key=lambda kv: -kv[1][0])[:15]:
            print(f"  cpu={c:7.1f}s run={r:7.1f}s stage={sid} tasks={n}  {desc}")
    finally:
        T.write_rdf, T.write_schema = real_write_rdf, real_write_schema
        shutil.rmtree(work, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
