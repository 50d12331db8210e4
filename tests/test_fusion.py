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


def _emb4(spark):
    """Tiny corpus with an obvious redundancy structure: ids 1/2 are
    near-duplicates highly relevant to the query, 3 is a different
    direction, 4 is orthogonal."""
    return spark.createDataFrame(
        [
            (1, [1.0, 0.0, 0.0, 0.01]),
            (2, [1.0, 0.0, 0.0, 0.02]),
            (3, [0.7, 0.7, 0.0, 0.0]),
            (4, [0.0, 0.0, 1.0, 0.0]),
        ],
        "vec_id long, embedding array<double>",
    )


def _q4(spark, v=(1.0, 0.05, 0.0, 0.0)):
    return spark.createDataFrame(
        [(list(v),)], "q array<double>"
    )


def test_mmr_rerank_hand_computed_diversity(spark):
    """lambda=1 reduces to pure relevance order (the near-dup pair
    first); a diversity-weighted lambda must break the pair apart —
    rank 2 goes to the differently-directed vector even though the
    twin has higher relevance."""
    from dgraph_dbpedia_spark.operators.fusion import mmr_rerank

    pure = mmr_rerank(
        _emb4(spark), _q4(spark), k=3, lambda_=1.0, shortlist_n=4
    ).collect()
    assert [r["vec_id"] for r in pure] == [1, 2, 3]
    assert [r["rank"] for r in pure] == [1, 2, 3]
    assert pure[0]["mmr"] == pure[0]["rel"]
    div = mmr_rerank(
        _emb4(spark), _q4(spark), k=3, lambda_=0.5, shortlist_n=4
    ).collect()
    assert [r["vec_id"] for r in div] == [1, 3, 4]
    # hand check of rank 2: mmr(3) = .5*rel(3) - .5*sim(3,1) must
    # beat mmr(2) = .5*rel(2) - .5*sim(2,1) ~ .5*(rel - ~1.0)
    rel = {r["vec_id"]: r["rel"] for r in pure}
    assert div[1]["mmr"] > 0.5 * rel[2] - 0.5 * 0.99


def test_mmr_rerank_candidates_arm_and_determinism(spark):
    """The candidates= path diversifies a caller-provided (id, sim)
    shortlist — e.g. an ANN serve arm — and repeated runs are
    identical."""
    from dgraph_dbpedia_spark.operators.fusion import mmr_rerank

    cand = spark.createDataFrame(
        [(1, 0.99), (2, 0.99), (3, 0.74), (4, 0.03)],
        "vec_id long, sim double",
    )
    a = mmr_rerank(
        _emb4(spark), _q4(spark), k=3, lambda_=0.5,
        shortlist_n=4, candidates=cand,
    ).collect()
    b = mmr_rerank(
        _emb4(spark), _q4(spark), k=3, lambda_=0.5,
        shortlist_n=4, candidates=cand,
    ).collect()
    assert a == b
    assert [r["vec_id"] for r in a] == [1, 3, 4]
    # provided rel carried through, not recomputed
    assert a[0]["rel"] == 0.99


def test_mmr_rerank_contracts(spark):
    """Knob validation, multi-row query guard, empty query / corpus
    typed results, k exceeding the candidate pool."""
    import pytest

    from dgraph_dbpedia_spark.operators.fusion import mmr_rerank

    emb, q = _emb4(spark), _q4(spark)
    with pytest.raises(ValueError, match="k must be"):
        mmr_rerank(emb, q, k=0)
    with pytest.raises(ValueError, match="lambda_"):
        mmr_rerank(emb, q, lambda_=1.5)
    with pytest.raises(ValueError, match="shortlist_n"):
        mmr_rerank(emb, q, k=5, shortlist_n=3)
    with pytest.raises(ValueError, match="bounded-collect"):
        mmr_rerank(emb, q, k=5, shortlist_n=20_000)
    multi = spark.createDataFrame(
        [([1.0, 0.0, 0.0, 0.0],), ([0.0, 1.0, 0.0, 0.0],)],
        "q array<double>",
    )
    with pytest.raises(ValueError, match="one query"):
        mmr_rerank(emb, multi, k=2)
    empty_q = multi.where(F.lit(False))
    out = mmr_rerank(emb, empty_q, k=2)
    assert out.columns == ["rank", "vec_id", "rel", "mmr"]
    assert out.count() == 0
    # k larger than the pool -> all candidates, ranked
    allp = mmr_rerank(emb, q, k=10, shortlist_n=10).collect()
    assert [r["rank"] for r in allp] == [1, 2, 3, 4]
    # NULL-vector rows are not candidates (no rel) on the brute path
    with_null = emb.unionByName(
        spark.createDataFrame(
            [(9, None)], "vec_id long, embedding array<double>"
        )
    )
    got = mmr_rerank(with_null, q, k=10, shortlist_n=10).collect()
    assert [r["vec_id"] for r in got] == [r["vec_id"] for r in allp]


def test_mmr_ragged_pair_oracle_parity(spark):
    """ADVICE r12: the DuckDB stage replay must reproduce the
    operator's per-width 'no comparable pair' rule on RAGGED
    shortlists instead of erroring on list_dot_product width
    mismatch. Candidate 2 is width-3 in a width-2 corpus: its pair
    sims to the selected set do not exist, so its mmr is NULL and it
    ranks last — on BOTH engines."""
    import duckdb

    import __spark_entry__ as entry_mod
    from dgraph_dbpedia_spark.operators.fusion import mmr_rerank

    df = spark.createDataFrame(
        [
            (1, [1.0, 0.0]),
            (2, [0.9, 0.1, 0.3]),  # ragged: width 3
            (3, [0.8, 0.2]),
        ],
        "vec_id long, embedding array<double>",
    )
    cand = spark.createDataFrame(
        [(1, 0.9), (2, 0.8), (3, 0.7)], "vec_id long, sim double"
    )
    q = spark.createDataFrame([([1.0, 0.0],)], "q array<double>")
    got = mmr_rerank(
        df, q, k=3, lambda_=0.5, shortlist_n=3, candidates=cand
    ).collect()

    sql = (
        "WITH cand AS (SELECT * FROM (VALUES "
        "(1, [1.0, 0.0]::DOUBLE[], 0.9::DOUBLE), "
        "(2, [0.9, 0.1, 0.3]::DOUBLE[], 0.8::DOUBLE), "
        "(3, [0.8, 0.2]::DOUBLE[], 0.7::DOUBLE)"
        ") t(vec_id, v, rel)),\n        "
        + entry_mod._sql_mmr_stages(3, 0.5)
    )
    oracle = duckdb.sql(sql).fetchall()
    assert [
        (r["rank"], r["vec_id"], r["rel"], r["mmr"]) for r in got
    ] == [tuple(r) for r in oracle]
    # the ragged candidate ranks LAST with NULL mmr on both engines
    assert got[-1]["vec_id"] == 2 and got[-1]["mmr"] is None


def test_rank_overlap_hand_computed(spark):
    """recall@k against a hand-built truth: overlap counting, the
    reference-spine rule (candidate-only groups vanish), the
    missing-candidate rule (recall 0), short references divide by
    n_ref, and the rank cut drops below-k rows before comparing."""
    from dgraph_dbpedia_spark.operators.fusion import rank_overlap

    ref = _mk(
        spark,
        [
            ("qa", 1, 0.9), ("qa", 2, 0.8), ("qa", 3, 0.7),
            ("qb", 7, 0.9),                       # short reference
            ("qc", 8, 0.5),                       # candidate missing
        ],
    )
    cand = _mk(
        spark,
        [
            ("qa", 2, 0.95), ("qa", 9, 0.85), ("qa", 1, 0.10),
            ("qb", 7, 0.4), ("qb", 6, 0.3),
            ("qd", 1, 0.9),                       # no truth -> absent
        ],
    )
    got = {
        r["query_id"]: (r["n_ref"], r["n_common"], r["recall"])
        for r in rank_overlap(ref, cand, k=3).collect()
    }
    # qa truth {1,2,3}; candidate top-3 {2,9,1} -> common {1,2}
    assert got == {
        "qa": (3, 2, 0.6667),
        "qb": (1, 1, 1.0),
        "qc": (1, 0, 0.0),
    }
    # k=2 cuts BOTH lists first: qa truth {1,2}, cand top-2 {2,9}
    got2 = {
        r["query_id"]: (r["n_common"], r["recall"])
        for r in rank_overlap(ref, cand, k=2).collect()
    }
    assert got2["qa"] == (1, 0.5)
    import pytest

    with pytest.raises(ValueError, match="k must be"):
        rank_overlap(ref, cand, k=0)


def test_mmr_rerank_nan_and_incomparable_guards(spark):
    """r12 review fixes: (1) a NaN-cosine row must not consume a
    shortlist slot (NaN sorts above every real score under desc);
    (2) a shortlisted candidate whose vector is missing has NO
    comparable pair — it ranks LAST with NULL mmr, never getting a
    -2.0 'diversity bonus' that would beat real candidates."""
    from dgraph_dbpedia_spark.operators.fusion import mmr_rerank

    nan_corpus = _emb4(spark).unionByName(
        spark.createDataFrame(
            [(9, [float("nan"), 0.0, 0.0, 0.0])],
            "vec_id long, embedding array<double>",
        )
    )
    # shortlist_n=4: without the pre-limit NaN filter, vec 9 evicts a
    # real candidate; with it, the pick set matches the clean corpus
    got = mmr_rerank(
        nan_corpus, _q4(spark), k=3, lambda_=0.5, shortlist_n=4
    ).collect()
    assert [r["vec_id"] for r in got] == [1, 3, 4]
    # candidates path: id 8 has a high provided sim but a NULL vector
    # in df -> no comparable pair ever -> NULL mmr, ranked last (and
    # NEVER a -2.0 bonus that would hand it rank 2); an id absent
    # from df entirely is dropped by the vector fetch (nothing to
    # diversify against)
    cand = spark.createDataFrame(
        [(1, 0.99), (8, 0.98), (3, 0.74), (4, 0.03), (99, 0.97)],
        "vec_id long, sim double",
    )
    df8 = _emb4(spark).unionByName(
        spark.createDataFrame(
            [(8, None)], "vec_id long, embedding array<double>"
        )
    )
    got2 = mmr_rerank(
        df8, _q4(spark), k=5, lambda_=0.5,
        shortlist_n=5, candidates=cand,
    ).collect()
    assert got2[0]["vec_id"] == 1
    assert [r["vec_id"] for r in got2[1:3]] == [3, 4]
    assert got2[3]["vec_id"] == 8 and got2[3]["mmr"] is None
    assert len(got2) == 4  # id 99 never fetched


def test_rank_overlap_duplicate_and_nan_guards(spark):
    """r12 review fixes: duplicate (group, id) rows are ONE retrieval
    at their best score (no join fan-out, recall <= 1.0), and NaN
    scores cannot claim rank slots."""
    from dgraph_dbpedia_spark.operators.fusion import rank_overlap

    ref = _mk(spark, [("qa", 1, 0.9), ("qa", 2, 0.8), ("qa", 3, 0.7)])
    dup_cand = _mk(
        spark,
        [
            ("qa", 1, 0.9), ("qa", 1, 0.8),      # same doc twice
            ("qa", 9, 0.7),
            ("qa", 7, float("nan")),             # NaN must not rank
        ],
    )
    got = rank_overlap(ref, dup_cand, k=3).collect()[0]
    assert (got["n_ref"], got["n_common"], got["recall"]) == (3, 1, 0.3333)
    # duplicate REF rows must not inflate n_ref either
    dup_ref = _mk(
        spark, [("qa", 1, 0.9), ("qa", 1, 0.85), ("qa", 2, 0.8)]
    )
    got2 = rank_overlap(dup_ref, dup_cand, k=3).collect()[0]
    assert got2["n_ref"] == 2 and got2["recall"] == 0.5
