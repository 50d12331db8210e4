from dgraph_dbpedia_spark.sources.ttl import read_ttl, parse_ttl_lines
from dgraph_dbpedia_spark.sources.parquet import read_triples_parquet
from dgraph_dbpedia_spark.sources.writers import write_partitioned_by

__all__ = [
    "read_ttl",
    "parse_ttl_lines",
    "read_triples_parquet",
    "write_partitioned_by",
]
