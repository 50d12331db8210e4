"""SparkSession builder tuned for the engine.

Mirrors the reference's session setup (local master + AQE on,
DbpediaDgraphSparkApp.scala:68-76) but sized for modern Spark: AQE
coalescing + skew-join handling on, Arrow enabled for the few Pandas-UDF
operators, shuffle partitions matched to cores in local mode.

At cluster scale the same builder applies — only master/memory confs
change; the plan-level decisions (broadcast hints, repartitionByRange,
partitioned writes) live in the operators, not in session conf.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def build_session(
    app_name: str = "dgraph_dbpedia_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    master = master or f"local[{cpus}]"
    shuffle_partitions = shuffle_partitions or max(cpus, 8)

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # FAIR lets the pipelines' concurrently-submitted independent
        # write jobs (plans/ingest.py, plans/transform.py) share executor
        # slots instead of queueing whole jobs FIFO — measured ~1.9x on
        # the transform pipeline
        .config("spark.scheduler.mode", "FAIR")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # driver testdata stores TIMESTAMP(NANOS); Spark has no nanos type —
        # read them as long (callers convert with F.timestamp_micros when
        # timestamp semantics are needed)
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        # throughput GC for batch pipelines: measured transform 38.3s
        # (ParallelGC) vs 43.5s (G1) at 600k subjects on local[32]; G1's
        # concurrent cycles pay off for latency, not these bulk jobs.
        # Only effective when this process launches the JVM (CLI,
        # tools/pipeline_bench.py) — a pre-existing JVM keeps its GC
        .config(
            "spark.driver.extraJavaOptions",
            os.environ.get("SPARK_GRAFT_DRIVER_JAVA_OPTS", "-XX:+UseParallelGC"),
        )
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
