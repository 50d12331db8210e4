"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata (SURVEY §7.8 extension surface).

Design for 100 TB: binaries ride as ``binary`` columns in Parquet
(page-compressed, column-pruned away unless selected); decode /
feature-extract / resize / frame-sample run as Arrow-batched
``mapInPandas`` stages — the one place this engine legitimately crosses
into Python, because codec work is per-cell CPU-bound and has no
Catalyst expression form. Batch size rides
``spark.sql.execution.arrow.maxRecordsPerBatch``; partitioning is
whatever the upstream frame had (no shuffle is introduced).

The actual codecs (PIL/ffmpeg/librosa) are NOT in this container, so
the decode kernels are STUBS: ``use_real_decoder=True`` raises
``NotImplementedError`` where the real library call belongs, and the
default path produces a deterministic fake derived from the md5 of the
bytes — which keeps the full Spark-side pipeline (schema, Arrow
batching, UDF signatures) real, testable, and DuckDB-oracle-checkable.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

IMAGE_META_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("width", T.LongType()),
        T.StructField("height", T.LongType()),
        T.StructField("format", T.StringType()),
    ]
)

FRAME_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("frame_idx", T.LongType()),
        T.StructField("frame_hash", T.LongType()),
    ]
)


def attach_binary(df: DataFrame, text_col: str = "text", out_col: str = "content") -> DataFrame:
    """Test/demo helper: materialize an opaque binary column (UTF-8
    bytes of a text column). Real pipelines read binary straight from
    Parquet/object storage."""
    return df.withColumn(out_col, F.encode(F.col(text_col), "UTF-8"))


def _fake_dims(content: bytes) -> tuple[int, int]:
    """Deterministic stand-in for a decoded image's dimensions: derived
    from the md5 of the bytes (cross-engine reproducible)."""
    h = int(hashlib.md5(content).hexdigest()[:15], 16)
    return 16 + h % 4096, 16 + (h // 4096) % 4096


def decode_image_meta(
    df: DataFrame,
    id_col: str = "id",
    content_col: str = "content",
    use_real_decoder: bool = False,
) -> DataFrame:
    """Binary -> (id, n_bytes, width, height, format) via Arrow-batched
    mapInPandas. The real decoder belongs at the marked site."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if use_real_decoder:
                # real implementation: PIL.Image.open(io.BytesIO(b)).size
                raise NotImplementedError("image codec not available in this environment")
            dims = [_fake_dims(bytes(b)) for b in pdf[content_col]]
            yield pd.DataFrame(
                {
                    "id": pdf[id_col].astype("int64"),
                    "n_bytes": [len(bytes(b)) for b in pdf[content_col]],
                    "width": [w for w, _ in dims],
                    "height": [h for _, h in dims],
                    "format": "fake/deterministic",
                }
            )

    return df.select(F.col(id_col), F.col(content_col)).mapInPandas(
        kernel, IMAGE_META_SCHEMA
    )


def frame_sample(
    df: DataFrame,
    id_col: str = "id",
    content_col: str = "content",
    every_n_bytes: int = 64,
    use_real_decoder: bool = False,
) -> DataFrame:
    """Video frame sampling stub: emits one row per sampled 'frame'
    (here: per byte-stride chunk) — demonstrates the 1-to-N mapInPandas
    shape a real ffmpeg-based sampler would have."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if use_real_decoder:
                raise NotImplementedError("video codec not available in this environment")
            ids, idxs, hashes = [], [], []
            for vid, b in zip(pdf[id_col], pdf[content_col]):
                data = bytes(b)
                for i, off in enumerate(range(0, max(len(data), 1), every_n_bytes)):
                    chunk = data[off : off + every_n_bytes]
                    ids.append(int(vid))
                    idxs.append(i)
                    hashes.append(int(hashlib.md5(chunk).hexdigest()[:15], 16))
            yield pd.DataFrame({"id": ids, "frame_idx": idxs, "frame_hash": hashes})

    return df.select(F.col(id_col), F.col(content_col)).mapInPandas(
        kernel, FRAME_SCHEMA
    )


def embed_binary(
    df: DataFrame,
    id_col: str = "id",
    content_col: str = "content",
    dims: int = 8,
    use_real_decoder: bool = False,
) -> DataFrame:
    """Feature-extraction stub: binary -> float vector (md5-seeded fake;
    a real model inference call belongs at the marked site). Output
    feeds the similarity operators (operators/similarity.py)."""
    out_schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.FloatType())),
        ]
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if use_real_decoder:
                raise NotImplementedError("model runtime not available in this environment")
            vecs = []
            for b in pdf[content_col]:
                digest = hashlib.md5(bytes(b)).digest()
                vecs.append([digest[i] / 255.0 - 0.5 for i in range(dims)])
            yield pd.DataFrame({"id": pdf[id_col].astype("int64"), "embedding": vecs})

    return df.select(F.col(id_col), F.col(content_col)).mapInPandas(kernel, out_schema)
