"""Execution metrics reporting — spill and memory observability.

Parity with the reference's SparkListener metrics (X5,
DbpediaDgraphSparkApp.scala:79-90,450): it accumulates
``memoryBytesSpilled`` / ``diskBytesSpilled`` and per-stage peak
execution memory, then prints them at the end of the run.

PySpark cannot subclass a JVM SparkListener without a py4j callback
server, so the primary path reads the driver's ``AppStatusStore``
directly over py4j (``sc.statusStore.stageList``) — the same store the
UI and REST API serve from, populated by the always-on
AppStatusListener, so it works with ``spark.ui.enabled=false`` (the
default session). The REST API (/api/v1/applications/{id}/stages)
remains as a fallback when the UI happens to be enabled.
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
    """Aggregate spill/peak-memory across all stages of the current
    application. Reads the JVM AppStatusStore via py4j (works with the
    UI disabled); falls back to the monitoring REST API if the store
    isn't reachable but a UI is."""
    try:
        return _from_status_store(spark)
    except Exception:  # noqa: BLE001 — py4j surface varies across versions
        return _from_rest(spark)


def _from_status_store(spark: SparkSession) -> SpillMetrics:
    sc = spark.sparkContext
    store = sc._jsc.sc().statusStore()
    # stageList(statuses, details, withSummaries, quantiles, taskStatus):
    # empty statuses list = all stages, no task details/summaries
    stages = store.stageList(
        sc._jvm.java.util.ArrayList(),
        False,
        False,
        sc._gateway.new_array(sc._jvm.double, 0),
        sc._jvm.java.util.ArrayList(),
    )
    m = SpillMetrics()
    it = stages.iterator()
    while it.hasNext():
        s = it.next()
        m.memory_bytes_spilled += s.memoryBytesSpilled()
        m.disk_bytes_spilled += s.diskBytesSpilled()
        m.peak_execution_memory = max(
            m.peak_execution_memory, s.peakExecutionMemory()
        )
        m.stages += 1
    return m


def _from_rest(spark: SparkSession) -> SpillMetrics:
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
