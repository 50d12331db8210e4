"""JSONL connector: lossless round trip (including JSON-escaped inner
newlines and unicode), corrupt-line quarantine, schema immutability,
and the one-object-per-line contract."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from dgraph_dbpedia_spark.sources.jsonl import (
    DOCUMENTS_SCHEMA,
    read_jsonl,
    split_corrupt,
    write_jsonl,
)


def test_jsonl_roundtrip_lossless(spark, tmp_path):
    rows = [
        (1, "plain text", "en", "src0", 10),
        (2, "multi\nline\ttext", "de", "src1", 15),   # inner newline/tab
        (3, "unicode café — ok", "fr", "src2", 12),
        (4, "", "en", "src0", 0),
        (5, None, None, None, None),                   # null fields
    ]
    df = spark.createDataFrame(rows, DOCUMENTS_SCHEMA)
    path = str(tmp_path / "docs")
    write_jsonl(df, path, n_files=2)
    clean, bad = split_corrupt(read_jsonl(spark, path))
    assert bad.count() == 0
    got = {r["doc_id"]: tuple(r) for r in clean.collect()}
    assert got == {r[0]: r for r in rows}
    # one-object-per-line contract survives inner newlines
    part_files = [
        f for f in os.listdir(path) if f.startswith("part-")
    ]
    n_lines = 0
    for f in part_files:
        with open(os.path.join(path, f), encoding="utf-8") as fh:
            for line in fh:
                if line.strip():
                    json.loads(line)  # every physical line is one object
                    n_lines += 1
    assert n_lines == len(rows)


def test_jsonl_corrupt_quarantine(spark, tmp_path):
    p = tmp_path / "mixed"
    p.mkdir()
    (p / "data.jsonl").write_text(
        '{"doc_id": 1, "text": "good", "lang": "en", "source": "s", "n_chars": 4}\n'
        "this is not json at all\n"
        '{"doc_id": 2, "text": "also good", "lang": "de", "source": "s", "n_chars": 9}\n'
    )
    clean, bad = split_corrupt(read_jsonl(spark, str(p)))
    assert sorted(r["doc_id"] for r in clean.collect()) == [1, 2]
    bad_rows = bad.collect()
    assert len(bad_rows) == 1 and "not json" in bad_rows[0]["_corrupt"]


def test_jsonl_schema_not_mutated(spark, tmp_path):
    """StructType.add mutates its receiver — the reader must never grow
    the shared module-level schema across calls."""
    n_before = len(DOCUMENTS_SCHEMA.fields)
    p = tmp_path / "d"
    p.mkdir()
    (p / "x.jsonl").write_text('{"doc_id": 1}\n')
    for _ in range(3):
        read_jsonl(spark, str(p)).collect()
    assert len(DOCUMENTS_SCHEMA.fields) == n_before
    assert "_corrupt" not in [f.name for f in DOCUMENTS_SCHEMA.fields]
