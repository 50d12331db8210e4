from __future__ import annotations

from pyspark.sql import functions as F

from dgraph_dbpedia_spark.sources.ttl import parse_ttl_lines, read_ttl


def test_parse_basic(spark, tmp_path):
    p = tmp_path / "x.ttl"
    p.write_text(
        "# comment line\n"
        "<http://a> <http://p> <http://b> .\n"
        '<http://a> <http://p2> "literal with spaces"@en .\n'
        '<http://a> <http://p3> "42"^^<http://www.w3.org/2001/XMLSchema#integer> .\n'
    )
    df = read_ttl(spark, str(p), lang="en")
    rows = {r["p"]: r for r in df.collect()}
    assert len(rows) == 3
    assert rows["<http://p>"]["o"] == "<http://b>"
    assert rows["<http://p2>"]["o"] == '"literal with spaces"@en'
    assert rows["<http://p3>"]["o"] == '"42"^^<http://www.w3.org/2001/XMLSchema#integer>'
    assert all(r["lang"] == "en" for r in rows.values())


def test_parse_keeps_object_spaces(spark):
    lines = spark.createDataFrame(
        [('<http://s> <http://p> "a b c d" .',)], ["value"]
    )
    row = parse_ttl_lines(lines).collect()[0]
    assert row["s"] == "<http://s>"
    assert row["o"] == '"a b c d"'


def test_parse_is_native(spark):
    """The parse must stay inside codegen — no BatchEvalPython in plan."""
    lines = spark.createDataFrame([("x y z .",)], ["value"])
    plan = parse_ttl_lines(lines)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan
