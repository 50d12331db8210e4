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
    # explicit schema, not inference: an empty dataset under the
    # selected languages writes a _SUCCESS-only dir, and schema
    # inference on it raises UNABLE_TO_INFER_SCHEMA — the exact case
    # this S4 fallback exists to tolerate. The known schema also skips
    # a footer-read job on the happy path.
    df = spark.read.schema(TRIPLE_SCHEMA).parquet(path)
    if languages:
        # partition-column filter -> directory pruning, no data read for
        # unselected languages
        df = df.where(F.col("lang").isin(languages))
    return df
