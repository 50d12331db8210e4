"""Cross-engine deterministic hashing and shingling primitives.

All dedup/similarity operators hash with ``md5 -> first 15 hex chars ->
int64`` instead of Spark's xxhash64/murmur: md5 is bit-identical across
engines (Spark, DuckDB, Python), which makes every hash-based operator
oracle-checkable, and 15 hex chars (60 bits) stay inside a signed int64
in every engine. Seeded families come from suffixing the input with
``#<seed>``.

Scale note: md5 is ~2-3x slower than xxhash64 per call but both are
memory-bandwidth-trivial next to the shuffle these operators feed;
stay with md5 for verifiability. All functions are native Catalyst
expressions — no Python UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def hash64(col: Column, seed: int | None = None, fast: bool = False) -> Column:
    """Deterministic 60-bit integer hash of a string column.

    ``fast=True`` switches to Spark's built-in xxhash64 (codegen'd,
    ~3-5x cheaper per call) — the production path for 100 TB runs where
    cross-engine oracle checks don't apply. Same int64 column type, so
    every downstream plan shape is identical."""
    if fast:
        return F.xxhash64(col, F.lit(seed or 0))
    if seed is not None:
        col = F.concat(col, F.lit(f"#{seed}"))
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("bigint")


def hash64_sql(expr: str, seed: int | None = None) -> str:
    """DuckDB equivalent of :func:`hash64` for oracle queries."""
    if seed is not None:
        expr = f"({expr} || '#{seed}')"
    return f"('0x' || substring(md5({expr}), 1, 15))::BIGINT"


def hash64_py(value: str, seed: int | None = None) -> int:
    """Host-side twin of :func:`hash64` (identical md5 math) for
    precomputing constants like LSH hyperplanes."""
    import hashlib

    if seed is not None:
        value = f"{value}#{seed}"
    return int(hashlib.md5(value.encode()).hexdigest()[:15], 16)


def tokens(text: Column) -> Column:
    """Whitespace tokenization (empty-string-safe)."""
    return F.filter(F.split(F.trim(text), r"\s+"), lambda t: t != "")


def tokens_sql(expr: str) -> str:
    return f"list_filter(regexp_split_to_array(trim({expr}), '\\s+'), t -> t != '')"


def shingles(toks: Column, w: int) -> Column:
    """w-token shingles, distinct, as strings joined by a single space.

    Documents shorter than ``w`` tokens produce one shingle of all their
    tokens (so they still participate in dedup).
    """
    n = F.greatest(F.size(toks) - (w - 1), F.lit(1))
    return F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), n),
            lambda i: F.concat_ws(" ", F.slice(toks, i, w)),
        )
    )


def shingles_sql(toks_expr: str, w: int) -> str:
    return (
        f"list_distinct(list_transform("
        f"range(1, greatest(len({toks_expr}) - {w - 1}, 1) + 1), "
        f"i -> array_to_string(list_slice({toks_expr}, i, i + {w - 1}), ' ')))"
    )
