from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dgraph_dbpedia_spark.operators.dedup import (
    exact_dedup,
    minhash_dedup_pairs,
    minhash_lsh_candidates,
    minhash_signatures,
    ngram_jaccard_pairs,
    simhash,
    simhash_near_dup_pairs,
)


@pytest.fixture(scope="module")
def docs(spark):
    base = "the quick brown fox jumps over the lazy dog again and again"
    near = "the quick brown fox jumps over the lazy cat again and again"
    other = "completely different words describing unrelated matters entirely here now"
    return spark.createDataFrame(
        [(1, base), (2, base), (3, near), (4, other)], ["doc_id", "text"]
    )


def test_exact_dedup(spark, docs):
    out = exact_dedup(docs)
    reps = sorted(r["doc_id"] for r in out.collect())
    assert reps == [1, 3, 4]  # 1==2 collapse to min id 1


def test_ngram_jaccard_identical_pair(spark, docs):
    pairs = {(r["a"], r["b"]): r["jaccard"] for r in
             ngram_jaccard_pairs(docs, threshold=0.3).collect()}
    assert pairs[(1, 2)] == 1.0
    assert (1, 3) in pairs and 0.3 <= pairs[(1, 3)] < 1.0
    assert (1, 4) not in pairs


def test_minhash_identical_signatures(spark, docs):
    sigs = {r["doc_id"]: r["sig"] for r in minhash_signatures(docs).collect()}
    assert sigs[1] == sigs[2]
    assert sigs[1] != sigs[4]
    assert len(sigs[1]) == 16


def test_minhash_pipeline_finds_near_dups(spark, docs):
    pairs = {(r["a"], r["b"]): r["jaccard"] for r in
             minhash_dedup_pairs(docs, threshold=0.3).collect()}
    assert pairs[(1, 2)] == 1.0
    assert (1, 4) not in pairs


def test_simhash_hamming(spark, docs):
    sh = {r["doc_id"]: r["simhash"] for r in simhash(docs).collect()}
    assert sh[1] == sh[2]
    ham13 = bin(sh[1] ^ sh[3]).count("1")
    ham14 = bin(sh[1] ^ sh[4]).count("1")
    assert ham13 < ham14  # near-dup closer than unrelated


def test_simhash_near_dup_pairs(spark, docs):
    pairs = {(r["a"], r["b"]): r["hamming"] for r in
             simhash_near_dup_pairs(docs, max_hamming=10).collect()}
    assert pairs[(1, 2)] == 0
    assert (1, 4) not in pairs


def test_no_python_udf_in_plans(spark, docs):
    for df in (minhash_signatures(docs), simhash(docs),
               ngram_jaccard_pairs(docs, threshold=0.1)):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
