"""Property tests (hypothesis): the native-expression rewrites must
match a direct host-side implementation of the reference's Scala
semantics on arbitrary inputs.

- extract_datatype vs extractDataType (DbpediaDgraphSparkApp.scala:544-553)
- ttl line parse vs dropRight(2).split(" ", 3) (DbpediaToParquetSparkApp.scala:147)

Batched: hypothesis generates input lists, one Spark job per list.
"""

from __future__ import annotations

import os

from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import functions as F

from dgraph_dbpedia_spark.functions.rdf import extract_datatype
from dgraph_dbpedia_spark.sources.ttl import parse_ttl_lines


def ref_extract_datatype(value: str) -> tuple[str, str | None]:
    """Host-side port of the reference UDF's exact split/rejoin logic.

    Scala/Java ``split`` with the default limit drops TRAILING empty
    fields (Python's keeps them), so the port strips trailing carets
    first — trailing empty fields correspond 1:1 to trailing separators.
    All-caret inputs (``'^^'``) crash the Scala UDF (``.last`` of an
    empty array); the engine defines them as (v='', t='') instead, and
    the stripped-then-split model here yields exactly that.
    """
    if value.startswith("<"):
        return value, "<uri>"
    if "^^" in value:
        fields = value.rstrip("^").split("^")
        return "^".join(fields[:-2]), fields[-1]
    return value, None


_object_strings = st.one_of(
    st.text(
        alphabet=st.characters(blacklist_categories=("Cs",), blacklist_characters="\n\r"),
        min_size=1,
        max_size=40,
    ),
    # caret-dense strings to hammer the Scala trailing-empty-drop edge
    st.text("ab^", min_size=1, max_size=12),
    st.builds(lambda v, t: f'"{v}"^^<{t}>', st.text("abc^", min_size=0, max_size=8),
              st.text("xyz", min_size=1, max_size=5)),
    st.builds(lambda b, n: b + "^" * n, st.text("ab^", min_size=0, max_size=6),
              st.integers(min_value=1, max_value=4)),
    st.builds(lambda u: f"<http://{u}>", st.text("abc./", min_size=1, max_size=12)),
)


_EXAMPLES = int(os.environ.get("SPARK_GRAFT_HYPOTHESIS_EXAMPLES", "40"))


@settings(max_examples=_EXAMPLES, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.lists(_object_strings, min_size=1, max_size=50))
def test_extract_datatype_matches_reference(spark, values):
    df = spark.createDataFrame([(v,) for v in values], ["o"])
    v, t = extract_datatype(F.col("o"))
    got = [(r["v"], r["t"]) for r in df.select(v.alias("v"), t.alias("t")).collect()]
    want = [ref_extract_datatype(x) for x in values]
    assert got == want


def ref_parse(line: str) -> tuple[str, ...] | None:
    if line.startswith("#") or len(line) <= 2:
        return None
    parts = line[:-2].split(" ", 2)
    return tuple(parts + [""] * (3 - len(parts)))


_line_bodies = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",), blacklist_characters="\n\r"),
    min_size=1,
    max_size=60,
)


@settings(max_examples=20, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.lists(st.builds(lambda b: f"{b} .", _line_bodies), min_size=1, max_size=30))
def test_ttl_parse_matches_reference(spark, lines):
    df = spark.createDataFrame([(l,) for l in lines], ["value"])
    got = [
        (r["s"] or "", r["p"] or "", r["o"] or "")
        for r in parse_ttl_lines(df).collect()
    ]
    want = [p for p in (ref_parse(l) for l in lines) if p is not None]
    assert got == want
