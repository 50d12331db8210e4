from __future__ import annotations

import json

from pyspark.sql import functions as F

from dgraph_dbpedia_spark.functions.rdf import (
    blank_node,
    extract_datatype,
    geo_to_geojson,
    node_lang,
    rdf_line,
    remap_en_lang,
    remove_lang_tags,
    strip_angle_brackets,
    typed_triples,
)
from dgraph_dbpedia_spark.model import URI_TYPE, XSD_INTEGER, XSD_STRING


def _one(spark, o: str):
    df = spark.createDataFrame([(o,)], ["o"])
    v, t = extract_datatype(F.col("o"))
    return df.select(v.alias("v"), t.alias("t")).collect()[0]


def test_extract_uri(spark):
    r = _one(spark, "<http://x>")
    assert (r["v"], r["t"]) == ("<http://x>", URI_TYPE)


def test_extract_typed(spark):
    r = _one(spark, '"42"^^<http://www.w3.org/2001/XMLSchema#integer>')
    assert (r["v"], r["t"]) == ('"42"', XSD_INTEGER)


def test_extract_plain_literal(spark):
    r = _one(spark, '"hello"@en')
    assert r["v"] == '"hello"@en'
    assert r["t"] is None


def test_extract_value_containing_carets(spark):
    # value contains ^ and ^^: everything before the LAST ^^ is the value
    # (parity with reference extractDataType split/rejoin,
    # DbpediaDgraphSparkApp.scala:544-553)
    r = _one(spark, '"a^^b"^^<t>')
    assert (r["v"], r["t"]) == ('"a^^b"', "<t>")


def test_typed_triples_coerces_unknown(spark):
    df = spark.createDataFrame(
        [("<s>", "<p>", '"x"^^<http://unknown>', "en"),
         ("<s>", "<p>", '"plain"', "en")],
        ["s", "p", "o", "lang"],
    )
    out = typed_triples(df).collect()
    assert all(r["t"] == XSD_STRING for r in out)


def test_blank_node_deterministic(spark):
    df = spark.createDataFrame([("<http://x>",), ("<http://x>",)], ["s"])
    vals = [r[0] for r in df.select(blank_node(F.col("s"))).collect()]
    assert vals[0] == vals[1]
    assert vals[0].startswith("_:") and len(vals[0]) == 34


def test_remove_lang_tags(spark):
    df = spark.createDataFrame([('"hi"@en',), ('"x@y.com"',)], ["o"])
    vals = [r[0] for r in df.select(remove_lang_tags(F.col("o"))).collect()]
    assert vals == ['"hi"', '"x@y.com"']


def test_node_lang(spark):
    df = spark.createDataFrame(
        [("<http://de.dbpedia.org/resource/X>",), ("<http://dbpedia.org/resource/Y>",)],
        ["o"],
    )
    vals = [r[0] for r in df.select(node_lang(F.col("o"))).collect()]
    assert vals == ["de", "en"]


def test_remap_en_lang(spark):
    df = spark.createDataFrame([("en-de",), ("de",)], ["lang"])
    vals = [r[0] for r in df.select(remap_en_lang(F.col("lang"))).collect()]
    assert vals == ["en", "de"]


def test_geo_to_geojson_swaps_coords(spark):
    df = spark.createDataFrame([('"51.05 13.74"',)], ["o"])
    val = df.select(geo_to_geojson(F.col("o")).alias("g")).collect()[0]["g"]
    assert val.startswith('"') and val.endswith('"')
    parsed = json.loads(val[1:-1].replace('\\"', '"'))
    assert parsed["type"] == "Point"
    # dgraph wants lon,lat order
    assert abs(parsed["coordinates"][0] - 13.74) < 1e-4
    assert abs(parsed["coordinates"][1] - 51.05) < 1e-4


def test_strip_angle_brackets_and_line(spark):
    df = spark.createDataFrame([("<http://s>", "<http://p>", "<http://o>")], ["s", "p", "o"])
    r = df.select(
        strip_angle_brackets(F.col("s")).alias("u"),
        rdf_line(F.col("s"), F.col("p"), F.col("o")).alias("l"),
    ).collect()[0]
    assert r["u"] == "http://s"
    assert r["l"] == "<http://s> <http://p> <http://o> ."
