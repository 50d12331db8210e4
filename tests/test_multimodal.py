from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from dgraph_dbpedia_spark.operators.multimodal import (
    attach_binary,
    decode_image_meta,
    embed_binary,
    frame_sample,
)


@pytest.fixture(scope="module")
def binary_docs(spark):
    df = spark.createDataFrame(
        [(1, "hello world"), (2, "x" * 200)], ["id", "text"]
    )
    return attach_binary(df)


def test_decode_meta_deterministic(spark, binary_docs):
    out = {r["id"]: r for r in decode_image_meta(binary_docs).collect()}
    assert out[1]["n_bytes"] == 11
    assert out[2]["n_bytes"] == 200
    h = int(hashlib.md5(b"hello world").hexdigest()[:15], 16)
    assert out[1]["width"] == 16 + h % 4096
    assert out[1]["height"] == 16 + (h // 4096) % 4096


def test_decode_real_path_is_marked(spark, binary_docs):
    with pytest.raises(Exception) as exc:
        decode_image_meta(binary_docs, use_real_decoder=True).collect()
    assert "NotImplementedError" in str(exc.value) or "not available" in str(exc.value)


def test_frame_sample_one_to_many(spark, binary_docs):
    out = frame_sample(binary_docs, every_n_bytes=64).collect()
    per_id = {}
    for r in out:
        per_id.setdefault(r["id"], []).append(r["frame_idx"])
    assert per_id[1] == [0]           # 11 bytes -> 1 chunk
    assert per_id[2] == [0, 1, 2, 3]  # 200 bytes -> 4 chunks of 64


def test_embed_binary_feeds_similarity(spark, binary_docs):
    from dgraph_dbpedia_spark.operators.similarity import cosine_topk

    emb = embed_binary(binary_docs).withColumnRenamed("id", "vec_id")
    q = emb.where(F.col("vec_id") == 1).select(F.col("embedding").alias("q"))
    out = cosine_topk(emb, q, k=1)
    assert out.collect()[0]["vec_id"] == 1  # self is nearest


def test_arrow_batched_not_row_udf(spark, binary_docs):
    plan = decode_image_meta(binary_docs)._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" in plan
    assert "BatchEvalPython" not in plan


def test_documents_ascii_invariant(spark):
    """The frame_sample oracle chunks by CHARACTER in DuckDB but the
    kernel chunks by BYTE: equivalent only while the corpus is ASCII.
    Pin the invariant so a corpus change surfaces here, not as a silent
    oracle mismatch."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    non_ascii = docs.where(
        F.octet_length(F.col("text")) != F.length(F.col("text"))
    ).count()
    assert non_ascii == 0
