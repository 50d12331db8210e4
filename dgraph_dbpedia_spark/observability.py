"""Execution metrics reporting — spill and memory observability.

Parity with the reference's SparkListener metrics (X5,
DbpediaDgraphSparkApp.scala:79-90,450): it accumulates
``memoryBytesSpilled`` / ``diskBytesSpilled`` and per-stage peak
execution memory, then prints them at the end of the run.

PySpark cannot subclass a JVM SparkListener without a py4j callback
server, so this uses the public Spark monitoring REST API
(/api/v1/applications/{id}/stages) — same numbers, no JVM bridge.
Requires the UI to be enabled (pass ``enable_ui=True`` to
build_session's ``extra_conf`` as ``{"spark.ui.enabled": "true"}``).
"""

from __future__ import annotations

import json
import urllib.request
from dataclasses import dataclass

from pyspark.sql import SparkSession


@dataclass
class SpillMetrics:
    memory_bytes_spilled: int = 0
    disk_bytes_spilled: int = 0
    peak_execution_memory: int = 0
    stages: int = 0

    def report(self) -> str:
        gb = 1024**3
        mb = 1024**2
        return (
            f"memory spill: {self.memory_bytes_spilled / gb:.2f} GB  "
            f"disk spill: {self.disk_bytes_spilled / gb:.2f} GB  "
            f"peak execution memory: {self.peak_execution_memory / mb:.1f} MB  "
            f"stages: {self.stages}"
        )


def collect_spill_metrics(spark: SparkSession) -> SpillMetrics:
    """Aggregate spill/peak-memory across all completed stages of the
    current application via the monitoring REST API."""
    ui_url = spark.sparkContext.uiWebUrl
    if not ui_url:
        return SpillMetrics()
    app_id = spark.sparkContext.applicationId
    with urllib.request.urlopen(f"{ui_url}/api/v1/applications/{app_id}/stages") as r:
        stages = json.load(r)
    m = SpillMetrics()
    for s in stages:
        m.memory_bytes_spilled += s.get("memoryBytesSpilled", 0)
        m.disk_bytes_spilled += s.get("diskBytesSpilled", 0)
        m.peak_execution_memory = max(
            m.peak_execution_memory, s.get("peakExecutionMemory", 0)
        )
        m.stages += 1
    return m
