from __future__ import annotations

import pytest

from dgraph_dbpedia_spark.operators.textstats import (
    fingerprint,
    language_id,
    quality_score,
    token_counts,
)


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [
            (1, "the cat sat on the mat and it is that for"),
            (2, "der hund und die katze ist mit den von zu"),
            (3, "!!! ??? ... ###"),
            (4, "hello world 123 foo-bar"),
        ],
        ["doc_id", "text"],
    )


def test_language_id(spark, docs):
    out = {r["doc_id"]: r["lang_guess"] for r in language_id(docs).collect()}
    assert out[1] == "en"
    assert out[2] == "de"


def test_quality_score(spark, docs):
    out = {r["doc_id"]: r for r in quality_score(docs).collect()}
    assert out[1]["score"] > out[3]["score"]
    assert out[3]["punct_ratio"] > 0.5
    assert out[1]["n_tokens"] == 11
    assert 0.0 <= out[1]["score"] <= 1.0


def test_token_counts(spark, docs):
    out = {r["doc_id"]: r for r in token_counts(docs).collect()}
    assert out[4]["n_ws_tokens"] == 4
    # hello / world / 123 / foo / - / bar
    assert out[4]["n_bpe_tokens"] == 6


def test_fingerprint_stability(spark, docs):
    a = {r["doc_id"]: r["fp"] for r in fingerprint(docs).collect()}
    b = {r["doc_id"]: r["fp"] for r in fingerprint(docs).collect()}
    assert a == b
    assert len(set(a.values())) == 4  # distinct docs -> distinct fps
