"""Phase-level breakdown INSIDE write_rdf for each transform sink:
the ``count`` span (frame/cache materialization + the empty guard)
vs the ``write`` span (range sampling + sort + gzip + commit), per
sink, for the best of N warm runs.

This is the attribution layer under tools/profile_transform.py's
per-sink wall spans: r16 used it to show types.rdf:count (15.5 s —
the first materialization of every retained cache) rather than the
distinct or the write dominates the critical path.

Usage: python tools/profile_transform_phases.py [n_subjects] [iters]
(one untimed warm-up run, then `iters` timed runs, best reported)."""
import os, sys, tempfile, shutil, time
sys.path.insert(0, "/root/repo")
from dgraph_dbpedia_spark.session import build_session
from dgraph_dbpedia_spark.benchgen import generate_ttl_corpus, LANGS
from dgraph_dbpedia_spark.plans.ingest import ingest
from dgraph_dbpedia_spark.plans import transform as T
from dgraph_dbpedia_spark.sources.parquet import fs_delete
from dgraph_dbpedia_spark.sources.writers import write_partitioned_by
from pyspark.sql import functions as F
from pyspark import StorageLevel

n_subjects = int(sys.argv[1]) if len(sys.argv) > 1 else 600_000
iters = int(sys.argv[2]) if len(sys.argv) > 2 else 3
spark = build_session(app_name="prof-phases")
spark.sparkContext.setLogLevel("ERROR")
work = tempfile.mkdtemp(prefix="sparkgraft-phase-")
spans = []
t0 = [0.0]

def timed_write_rdf(spark_, df, path, persist=True, on_counted=None):
    name = os.path.basename(path)
    if persist:
        df = df.persist(StorageLevel.MEMORY_AND_DISK)
    try:
        filtered = T.invalid_predicate_filter(df)
        s0 = time.perf_counter() - t0[0]
        try:
            n = filtered.count()
        finally:
            if on_counted is not None:
                on_counted()
        s1 = time.perf_counter() - t0[0]
        spans.append((f"{name}:count", s0, s1))
        if not n:
            fs_delete(spark_, path)
        if n:
            parallel = spark_.sparkContext.defaultParallelism
            n_parts = max(-(-n // T.ROWS_PER_RDF_FILE), min(parallel, -(-n // 5_000)))
            s2 = time.perf_counter() - t0[0]
            write_partitioned_by(
                filtered, partition_cols=["lang"], more_file_cols=["p", "s"],
                sort_cols=["o"], n_partitions=n_parts,
                projection=[T.rdf_line(F.col("s"), F.col("p"), F.col("o")).alias("line")],
                fmt="text", options={"compression": "gzip"}, path=path,
            )
            s3 = time.perf_counter() - t0[0]
            spans.append((f"{name}:write", s2, s3))
    finally:
        if persist:
            df.unpersist()
    return T.read_rdf(spark_, path)

real = T.write_rdf
T.write_rdf = timed_write_rdf
try:
    generate_ttl_corpus(spark, f"{work}/ttl", n_subjects)
    ingest(spark, f"{work}/ttl", f"{work}/parquet", print_stats=False)
    cfg = T.TransformConfig(write_types=True, externalise_uris=True,
                            remove_language_tags=True,
                            top_infobox_properties_per_lang=100, print_stats=False)
    best = None
    for i in range(iters + 1):
        spans.clear()
        t0[0] = time.perf_counter()
        T.transform(spark, f"{work}/parquet", f"{work}/rdf", languages=list(LANGS), cfg=cfg)
        total = time.perf_counter() - t0[0]
        print(f"run: {total:.2f}s")
        if i > 0 and (best is None or total < best[0]):
            best = (total, list(spans))
    total, bs = best
    print(f"BEST transform: {total:.2f}s (subjects={n_subjects})")
    for name, s, e in sorted(bs, key=lambda x: x[1]):
        print(f"  {name:36s} start={s:6.2f}  end={e:6.2f}  dur={e-s:6.2f}")
finally:
    T.write_rdf = real
    shutil.rmtree(work, ignore_errors=True)
    spark.stop()
