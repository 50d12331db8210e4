"""Permanent driver-harness type gate (VERDICT r12 #3).

The driver canonicalizes BOTH engines' results through pandas before
hashing. Two type classes silently break that harness even when every
value is equal:

- DuckDB ``HUGEINT``/``DECIMAL`` outputs (e.g. an un-cast
  ``sum(BIGINT)``) become pandas float64/object and render ``1435.0``
  where Spark's long renders ``1435`` — same value, different hash.
  This was the three-round ``corpus_divergence`` red (r10-r12), fixed
  only by ``::BIGINT`` casts that the builder's own ``fetchall()``
  -based checker could never distinguish (Decimal('1435') -> '1435').
- LIST/STRUCT/MAP output columns crash the driver's pandas sort
  (``TypeError: unhashable type: 'list'``) — the r12
  ``hashed_doc_embeddings`` ``err``; registered rows must
  scalar-project (the ``normalize_embeddings`` convention).

This test LIMIT-0-types every ``oracle_sql()`` entry through DuckDB
(no Spark session, ~seconds) and fails on any unsafe output column —
so neither class can re-enter the registry unnoticed. The Spark-side
twin of the LIST rule is enforced in the sweep
(tools/check_correctness.py ``spark_unsafe_fields``), which sees the
real result schemas.
"""

from __future__ import annotations

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_SMALL", "/root/testdata/sf0.001")


@pytest.fixture(scope="module")
def oracle_con():
    # ONE table list: the sweep's own (a private copy would drift and
    # silently stop binding oracles that reference a new table)
    from tools.check_correctness import TABLES

    if not os.path.isdir(SF_DIR):
        pytest.skip(f"testdata dir {SF_DIR} missing")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    return con


def test_no_driver_unsafe_oracle_output_types(oracle_con):
    import __spark_entry__ as entry_mod
    from tools.check_correctness import duck_unsafe_types

    os.environ["SPARK_GRAFT_ORACLE_SF_DIR"] = os.path.abspath(SF_DIR)
    oracles = entry_mod.oracle_sql()
    assert len(oracles) > 100  # the registry, not a stub
    offenders: dict[str, list[str]] = {}
    for name, sql in oracles.items():
        try:
            bad = duck_unsafe_types(oracle_con, sql)
        except Exception as e:  # noqa: BLE001 — a broken oracle is its own failure
            offenders[name] = [f"oracle does not parse: {e}"]
            continue
        if bad:
            offenders[name] = bad
    assert not offenders, (
        "driver-unsafe oracle output types (HUGEINT/DECIMAL -> pandas "
        "float64 hash-flip; LIST/STRUCT -> pandas sort crash); cast "
        "::BIGINT / scalar-project these columns: "
        f"{offenders}"
    )


def test_guard_detects_the_r12_failure_classes(oracle_con):
    """The guard itself must flag the exact shapes that burned r10-r12
    — an un-cast sum (HUGEINT) and a list column — and pass their
    fixed forms."""
    from tools.check_correctness import duck_unsafe_types

    bad = duck_unsafe_types(
        oracle_con, "SELECT sum(r_regionkey) AS s FROM region"
    )
    assert bad and "HUGEINT" in bad[0]
    bad = duck_unsafe_types(oracle_con, "SELECT [1, 2] AS e")
    assert bad and "[]" in bad[0]
    # a bare 1.5 literal types as DECIMAL(2,1) — the guard flags even
    # that (conservative by design); safe oracles say ::DOUBLE
    assert duck_unsafe_types(oracle_con, "SELECT 1.5 AS d")
    # fixed-size ARRAY types ('DOUBLE[3]', no '[]' substring) are
    # lists to pandas too
    bad = duck_unsafe_types(
        oracle_con, "SELECT [1.0, 2.0, 3.0]::DOUBLE[3] AS e"
    )
    assert bad and "[3]" in bad[0]
    assert not duck_unsafe_types(
        oracle_con,
        "SELECT sum(r_regionkey)::BIGINT AS s, 1.5::DOUBLE AS d, "
        "'x' AS v FROM region",
    )


def test_spark_unsafe_fields_rule():
    """The sweep-side twin flags top-level array/map/struct columns
    and passes scalar schemas (no Spark session: plain type objects)."""
    from pyspark.sql.types import (
        ArrayType,
        DoubleType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    from tools.check_correctness import spark_unsafe_fields

    bad_schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("e", ArrayType(DoubleType())),
        ]
    )
    assert spark_unsafe_fields(bad_schema) == ["e: array<double>"]
    ok_schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("e_0", DoubleType()),
            StructField("lang", StringType()),
        ]
    )
    assert spark_unsafe_fields(ok_schema) == []
