from __future__ import annotations

from pyspark.sql import functions as F

from dgraph_dbpedia_spark.observability import collect_spill_metrics


def test_spill_metrics_via_rest(spark):
    spark.range(100000).groupBy((F.col("id") % 97).alias("k")).count().collect()
    m = collect_spill_metrics(spark)
    assert m.stages > 0
    assert m.memory_bytes_spilled >= 0
    assert "GB" in m.report()
