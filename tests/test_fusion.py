"""Reciprocal Rank Fusion (operators/fusion.py)."""

from pyspark.sql import functions as F


def _mk(spark, rows):
    return spark.createDataFrame(
        rows, "query_id string, doc_id long, score double"
    )


def test_rrf_fuse_hand_computed(spark):
    """Two arms, one query: fused scores equal the hand-computed
    1/(k+rank) sums; docs present in only one arm contribute only
    that arm's term; order of the input frames fixes rank columns but
    not the result set."""
    from dgraph_dbpedia_spark.operators.fusion import rrf_fuse

    lex = _mk(spark, [("q1", 10, 5.0), ("q1", 20, 3.0), ("q1", 30, 1.0)])
    sem = _mk(spark, [("q1", 20, 0.9), ("q1", 40, 0.8)])
    got = {
        (r["query_id"], r["doc_id"]): r["rrf_score"]
        for r in rrf_fuse([lex, sem], k=60).collect()
    }
    # lex ranks: 10->1, 20->2, 30->3; sem ranks: 20->1, 40->2
    exp = {
        ("q1", 10): round(1.0 / 61, 6),
        ("q1", 20): round(1.0 / 62 + 1.0 / 61, 6),
        ("q1", 30): round(1.0 / 63, 6),
        ("q1", 40): round(1.0 / 62, 6),
    }
    assert got == exp


def test_rrf_fuse_rank_tie_break_and_topn(spark):
    """Per-arm ranks break score ties by id ascending (the package's
    top-k rule), topn keeps the best per group by (rrf_score desc, id
    asc), and groups never mix."""
    from dgraph_dbpedia_spark.operators.fusion import rrf_fuse

    # q1: tie on score -> doc 5 outranks doc 7; q2 independent
    arm = _mk(
        spark,
        [
            ("q1", 7, 2.0),
            ("q1", 5, 2.0),
            ("q1", 9, 1.0),
            ("q2", 5, 9.0),
        ],
    )
    out = rrf_fuse([arm], k=60, topn=2).collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r["query_id"], []).append(
            (r["doc_id"], r["rrf_score"])
        )
    assert sorted(by_q["q1"]) == [
        (5, round(1.0 / 61, 6)),
        (7, round(1.0 / 62, 6)),
    ]
    assert by_q["q2"] == [(5, round(1.0 / 61, 6))]


def test_rrf_fuse_validates_inputs(spark):
    from dgraph_dbpedia_spark.operators.fusion import rrf_fuse

    import pytest

    arm = _mk(spark, [("q1", 1, 1.0)])
    with pytest.raises(ValueError):
        rrf_fuse([], k=60)
    with pytest.raises(ValueError):
        rrf_fuse([arm], k=0)
    with pytest.raises(ValueError):
        rrf_fuse([arm], topn=0)


def test_rrf_fuse_no_group_cols(spark):
    """Un-grouped fusion (one global ranking per arm) works with
    group_cols=() — the window degenerates to a global rank."""
    from dgraph_dbpedia_spark.operators.fusion import rrf_fuse

    a = spark.createDataFrame(
        [(1, 3.0), (2, 2.0)], "doc_id long, score double"
    )
    b = spark.createDataFrame(
        [(2, 0.5), (3, 0.4)], "doc_id long, score double"
    )
    got = {
        r["doc_id"]: r["rrf_score"]
        for r in rrf_fuse([a, b], k=10, group_cols=()).collect()
    }
    assert got == {
        1: round(1.0 / 11, 6),
        2: round(1.0 / 12 + 1.0 / 11, 6),
        3: round(1.0 / 12, 6),
    }
