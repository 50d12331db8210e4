"""Parquet triple source with partition pruning and missing-input fallback.

Reference behavior (DbpediaDgraphSparkApp.scala:474-489):
- read the partitioned triple parquet for one dataset (S2)
- filter to the selected languages — a filter on the ``lang`` partition
  column, so Catalyst prunes partition directories before the scan (P5)
- if the dataset path does not exist, substitute an empty, correctly
  typed DataFrame so downstream unions/joins still resolve (S4).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dgraph_dbpedia_spark.model import TRIPLE_SCHEMA


def read_triples_parquet(
    spark: SparkSession,
    path: str,
    languages: list[str] | None = None,
) -> DataFrame:
    if not os.path.exists(path):
        return spark.createDataFrame([], TRIPLE_SCHEMA)
    df = spark.read.parquet(path)
    if languages:
        # partition-column filter -> directory pruning, no data read for
        # unselected languages
        df = df.where(F.col("lang").isin(languages))
    return df
