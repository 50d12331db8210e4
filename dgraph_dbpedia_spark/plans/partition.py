"""Range-partitioned sorted Parquet writing demo — parity with
``PartitionSparkApp`` (PartitionSparkApp.scala:40-54): read several
languages of one dataset, fold-union, range-repartition by
``(lang, s)``, sort within partitions by ``(lang, s, p, o)``, write
partitioned by ``lang``.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession

from dgraph_dbpedia_spark.sources.parquet import read_triples_parquet
from dgraph_dbpedia_spark.sources.writers import write_partitioned_by


def partition_demo(
    spark: SparkSession, path: str, out: str, languages: list[str]
) -> None:
    frames = [
        read_triples_parquet(spark, path, [lang]) for lang in languages
    ]
    df = reduce(DataFrame.unionByName, frames)
    write_partitioned_by(
        df,
        partition_cols=["lang"],
        more_file_cols=["s"],
        sort_cols=["p", "o"],
        path=out,
    )
