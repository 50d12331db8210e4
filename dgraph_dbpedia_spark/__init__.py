"""dgraph_dbpedia_spark — a PySpark-native analytics engine with the
query and data-processing capabilities of G-Research/dgraph-dbpedia.

Brand-new idiomatic PySpark design (DataFrame/SQL + Catalyst), not a port:
the reference (read-only at /root/reference) defines WHAT to compute —
an RDF-triple ETL surface (parse, type-extract, disambiguate, top-k,
clean, rewrite, schema-derive, partition-write, stats) — and this package
re-expresses each capability with declarative DataFrame plans so Catalyst
/ Tungsten / AQE pick the physical strategy.

Layout:
- ``model``      — schemas and datatype constants (reference package.scala:20)
- ``session``    — tuned SparkSession builder
- ``sources``    — ttl/parquet readers, partitioned sorted writers, catalog
- ``functions``  — native-expression RDF helpers + schema generation
- ``operators``  — top-k, majority-vote, stats, dedup, similarity, text
- ``plans``      — end-to-end pipelines mirroring the reference's 3 apps
- ``streaming``  — Structured Streaming extensions over the events table
"""

__version__ = "0.1.0"
