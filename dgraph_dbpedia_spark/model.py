"""Data model: the flat RDF triple table and its derived shapes.

Reference: the single data abstraction is ``Triple(s, p, o)`` plus a
``lang`` column attached at read time (package.scala:20,
DbpediaToParquetSparkApp.scala:77). PySpark has no typed Dataset, so we
enforce shape with declared StructType constants and treat every pipeline
stage as a pure function DataFrame -> DataFrame over these schemas.
"""

from __future__ import annotations

from pyspark.sql import types as T

# triple + lang: the canonical in-flight shape (SURVEY §1.1)
TRIPLE_SCHEMA = T.StructType(
    [
        T.StructField("s", T.StringType(), True),
        T.StructField("p", T.StringType(), True),
        T.StructField("o", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
    ]
)

# typed triple: o split into bare value v + datatype URI t
# (DbpediaDgraphSparkApp.scala:199-203)
TYPED_TRIPLE_SCHEMA = T.StructType(
    [
        T.StructField("s", T.StringType(), True),
        T.StructField("p", T.StringType(), True),
        T.StructField("v", T.StringType(), True),
        T.StructField("t", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
    ]
)

# supported object datatypes; everything else coerces to xsd:string
# (DbpediaDgraphSparkApp.scala:188-194,203)
URI_TYPE = "<uri>"
XSD_DATE = "<http://www.w3.org/2001/XMLSchema#date>"
XSD_DOUBLE = "<http://www.w3.org/2001/XMLSchema#double>"
XSD_INTEGER = "<http://www.w3.org/2001/XMLSchema#integer>"
XSD_STRING = "<http://www.w3.org/2001/XMLSchema#string>"

SUPPORTED_TYPES = [URI_TYPE, XSD_DATE, XSD_DOUBLE, XSD_INTEGER, XSD_STRING]

# datatype URI -> Dgraph schema type (DbpediaDgraphSparkApp.scala:266-274)
DGRAPH_DATA_TYPES = {
    URI_TYPE: "[uid]",
    XSD_DATE: "datetime",
    XSD_DOUBLE: "float",
    XSD_INTEGER: "int",
    XSD_STRING: "string",
}

# Dgraph type -> index spec (DbpediaDgraphSparkApp.scala:277-285)
DGRAPH_INDICES = {
    "uid": "@reverse",
    "[uid]": "@reverse",
    "datetime": "@index(day)",
    "float": "@index(float)",
    "int": "@index(int)",
    "string": "@index(fulltext)",
}
