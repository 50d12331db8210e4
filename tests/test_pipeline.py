"""End-to-end golden tests: miniature ingest -> transform, asserting the
reference's own validation invariants (SURVEY §5): write/read-back
counts, coverage ratio, schema-file shape, partition layout,
determinism under re-run."""

from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import functions as F

from dgraph_dbpedia_spark.plans.ingest import ingest
from dgraph_dbpedia_spark.plans.transform import TransformConfig, transform
from tests import fixtures


@pytest.fixture(scope="module")
def pipeline_dirs(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("ttl")
    parquet = tmp_path_factory.mktemp("parquet")
    out = tmp_path_factory.mktemp("rdf")
    fixtures.generate(str(root))
    results = ingest(spark, str(root), str(parquet), print_stats=False)
    outputs = transform(
        spark,
        str(parquet),
        str(out),
        cfg=TransformConfig(
            write_types=True,
            externalise_uris=True,
            remove_language_tags=True,
            top_infobox_properties_per_lang=5,
            print_stats=False,
        ),
    )
    return root, parquet, out, results, outputs


def test_ingest_partition_layout(pipeline_dirs):
    _, parquet, _, results, _ = pipeline_dirs
    labels = os.path.join(str(parquet), "labels.parquet")
    langs = {d for d in os.listdir(labels) if d.startswith("lang=")}
    # de/en/vi plus en-de/en-vi pseudo-langs from en_uris
    assert langs == {"lang=de", "lang=en", "lang=vi", "lang=en-de", "lang=en-vi"}


def test_ingest_round_trip_counts(spark, pipeline_dirs):
    root, parquet, _, results, _ = pipeline_dirs
    labels = spark.read.parquet(os.path.join(str(parquet), "labels.parquet"))
    # 40 subjects * 3 langs + 10 en_uris * 2 langs
    assert labels.count() == 40 * 3 + 10 * 2
    # every triple has 4 cols, o keeps the lang tag
    row = labels.where(F.col("lang") == "de").orderBy("s").first()
    assert row["o"].endswith('"@de') or "@de" in row["o"]


def test_transform_outputs_exist(pipeline_dirs):
    _, _, out, _, outputs = pipeline_dirs
    for name in ("labels", "infobox_properties", "interlanguage_links", "page_links",
                 "article_categories", "skos_categories", "geo_coordinates",
                 "types", "external_ids"):
        assert name in outputs
        assert os.path.exists(os.path.join(str(out), f"{name}.rdf"))


def test_rdf_lines_shape(spark, pipeline_dirs):
    _, _, out, _, _ = pipeline_dirs
    path = os.path.join(str(out), "labels.rdf")
    lines = spark.read.text(path)
    bad = lines.where(~F.col("value").endswith(" .")).count()
    assert bad == 0
    # externalised: all subjects are blank nodes
    assert lines.where(~F.col("value").startswith("_:")).count() == 0
    # gzip files
    assert glob.glob(os.path.join(path, "lang=*", "*.gz"))


def test_invalid_predicates_dropped(spark, pipeline_dirs):
    _, _, out, _, outputs = pipeline_dirs
    infobox = outputs["infobox_properties"]
    assert infobox.where(F.col("p").contains("@") | F.col("p").contains("~")).count() == 0


def test_negative_dates_dropped(spark, pipeline_dirs):
    _, _, out, _, outputs = pipeline_dirs
    infobox = outputs["infobox_properties"]
    assert infobox.where(F.col("o").startswith('"-')).count() == 0


def test_schema_files(spark, pipeline_dirs):
    _, _, out, _, _ = pipeline_dirs
    plain = spark.read.text(os.path.join(str(out), "schema.dgraph"))
    indexed = spark.read.text(os.path.join(str(out), "schema.indexed.dgraph"))
    assert plain.count() == indexed.count() > 0
    import re

    for r in indexed.collect():
        assert re.match(r"^<.+>: \S+ @\S+.* \.$", r["value"]), r["value"]
    # xid predicate present (externalise_uris=True)
    assert indexed.where(F.col("value").startswith("<xid>:")).count() == 1


def test_en_uris_filtered_by_en_topk(spark, pipeline_dirs):
    """en-{lang} infobox rows must be kept iff their predicate is in the
    *en* top-k (DbpediaDgraphSparkApp.scala:133-135)."""
    _, _, out, _, outputs = pipeline_dirs
    infobox = outputs["infobox_properties"]
    en_star = infobox.where(F.col("lang").startswith("en-"))
    assert en_star.count() > 0  # en pop predicate is in en top-5


def test_geojson_output(spark, pipeline_dirs):
    _, _, out, _, outputs = pipeline_dirs
    geo = outputs["geo_coordinates"]
    row = geo.first()
    assert "geo:geojson" in row["o"]
    assert "Point" in row["o"]


def test_coverage_ratio(spark, pipeline_dirs):
    """Reference invariant: cleaned infobox covers a large share of the
    original rows (SPARK.md:224)."""
    _, parquet, _, _, outputs = pipeline_dirs
    orig = spark.read.parquet(os.path.join(str(parquet), "infobox_properties.parquet"))
    cov = outputs["infobox_properties"].count() / orig.count()
    assert cov > 0.5


def test_schema_single_file_per_partition(pipeline_dirs):
    """Reference coalesce(1) parity (DbpediaDgraphSparkApp.scala:330):
    each (dataset, lang) schema dir holds exactly ONE part-file."""
    _, _, out, _, _ = pipeline_dirs
    for schema_dir in ("schema.dgraph", "schema.indexed.dgraph"):
        part_dirs = glob.glob(os.path.join(str(out), schema_dir, "dataset=*", "lang=*"))
        assert part_dirs, schema_dir
        for d in part_dirs:
            parts = [f for f in os.listdir(d) if f.startswith("part-")]
            assert len(parts) == 1, (d, parts)


def test_get_languages_en_star_expansion():
    """Selecting 'en' pulls in en-<lang> pseudo-language partitions
    (DbpediaDgraphSparkApp.scala:457-472); without 'en' no expansion."""
    from dgraph_dbpedia_spark.plans.transform import get_languages

    assert get_languages(None) is None
    assert get_languages(["de", "vi"]) == ["de", "vi"]
    assert get_languages(["en", "de", "vi"]) == [
        "de", "en", "en-de", "en-vi", "vi"
    ]
    assert get_languages(["en"]) == ["en"]


def test_transform_languages_selection_keeps_en_star(spark, pipeline_dirs, tmp_path):
    """--languages ['en','de'] must still read the lang=en-de partition
    (ADVICE r1: the raw list silently dropped every en-* partition)."""
    _, parquet, _, _, _ = pipeline_dirs
    out2 = tmp_path / "rdf_langs"
    outputs = transform(
        spark, str(parquet), str(out2), languages=["en", "de"],
        cfg=TransformConfig(
            write_types=False, externalise_uris=False,
            remove_language_tags=False, top_infobox_properties_per_lang=None,
            print_stats=False,
        ),
    )
    langs = {r["lang"] for r in outputs["labels"].select("lang").distinct().collect()}
    assert "en-de" in langs
    assert "vi" not in langs and "en-vi" not in langs


def test_per_lang_stats_tables(spark, pipeline_dirs):
    """The flagship's stats tables: one row per non-en-* lang plus the
    en-* rollup whose counts equal the sum of the en-* rows."""
    from dgraph_dbpedia_spark.operators.stats import per_lang_stats_tables

    _, parquet, _, _, _ = pipeline_dirs
    labels = spark.read.parquet(os.path.join(str(parquet), "labels.parquet"))
    links = spark.read.parquet(os.path.join(str(parquet), "page_links.parquet"))
    main, en_star = per_lang_stats_tables({"labels": labels, "page_links": links})
    main_rows = {r["lang"]: r for r in main.collect()}
    en_rows = en_star.collect()
    assert set(main_rows) == {"de", "en", "vi", "en-*"}
    assert {r["lang"] for r in en_rows} == {"en-de", "en-vi"}
    for col in ("labels", "page_links"):
        assert main_rows["en-*"][col] == sum(r[col] for r in en_rows)
        # fixture: 40 subjects per lang in labels
    assert main_rows["de"]["labels"] == 40


def test_types_derivation_includes_category_subjects(spark, pipeline_dirs):
    """article_categories SUBJECTS get dgraph.type Article (reference
    :419; missing in r1): every category-triple subject must appear as
    an Article type triple."""
    _, _, out, _, outputs = pipeline_dirs
    types = outputs["types"]
    cat_subjects = {
        r["s"] for r in outputs["article_categories"].select("s").distinct().collect()
    }
    article_nodes = {
        r["s"]
        for r in types.where(F.col("o") == '"Article"').select("s").collect()
    }
    assert cat_subjects <= article_nodes


def test_transform_deterministic(spark, pipeline_dirs, tmp_path):
    """Re-running the transform produces identical RDF line sets."""
    _, parquet, out, _, outputs = pipeline_dirs
    out2 = tmp_path / "rdf2"
    outputs2 = transform(
        spark,
        str(parquet),
        str(out2),
        cfg=TransformConfig(
            write_types=True,
            externalise_uris=True,
            remove_language_tags=True,
            top_infobox_properties_per_lang=5,
            print_stats=False,
        ),
    )
    a = spark.read.text(os.path.join(str(out), "infobox_properties.rdf"))
    b = spark.read.text(os.path.join(str(out2), "infobox_properties.rdf"))
    assert a.count() == b.count()
    assert a.exceptAll(b).count() == 0


def test_infobox_dims_equal_direct_operators(spark, pipeline_dirs):
    """The one-scan cube derivation must be value-identical to running
    top_k_per_group / majority_value_per_group / the schema distinct
    directly over the fact table (same counts, same tie-breaks)."""
    from dgraph_dbpedia_spark.functions.rdf import remap_en_lang, typed_triples
    from dgraph_dbpedia_spark.functions.schema_gen import infobox_predicate_schema
    from dgraph_dbpedia_spark.operators.majority import majority_value_per_group
    from dgraph_dbpedia_spark.plans.transform import infobox_dims, top_k_infobox

    _, parquet, _, _, _ = pipeline_dirs
    fact = spark.read.parquet(os.path.join(str(parquet), "infobox_properties.parquet"))
    fact = fact.withColumn("lang", F.col("lang").cast("string"))

    topk, pred_dt, schema_derived, dim_caches = infobox_dims(fact, 5)
    filtered_direct, topk_direct = top_k_infobox(fact, 5)
    assert topk.exceptAll(topk_direct).count() == 0
    assert topk_direct.exceptAll(topk).count() == 0

    typed = typed_triples(filtered_direct)
    pd_direct = majority_value_per_group(typed, ["p"], "t").select("p", "t")
    assert pred_dt.exceptAll(pd_direct).count() == 0
    assert pd_direct.exceptAll(pred_dt).count() == 0

    schema_direct = infobox_predicate_schema(filtered_direct, pd_direct)
    assert schema_derived.exceptAll(schema_direct).count() == 0
    assert schema_direct.exceptAll(schema_derived).count() == 0


def test_transform_schedule_independent(spark, pipeline_dirs, tmp_path, monkeypatch):
    """Output must not depend on sink-pool width: a single-worker
    (fully serial) run produces the same line sets as the module
    fixture's concurrent run — guards the r6 wave-scheduling work
    against any ordering-dependent nondeterminism."""
    _, parquet, out, _, _ = pipeline_dirs
    monkeypatch.setenv("SPARK_GRAFT_SINK_WORKERS", "1")
    out2 = tmp_path / "rdf_serial"
    transform(
        spark,
        str(parquet),
        str(out2),
        cfg=TransformConfig(
            write_types=True,
            externalise_uris=True,
            remove_language_tags=True,
            top_infobox_properties_per_lang=5,
            print_stats=False,
        ),
    )
    for ds in ("infobox_properties.rdf", "types.rdf", "external_ids.rdf"):
        a = spark.read.text(os.path.join(str(out), ds))
        b = spark.read.text(os.path.join(str(out2), ds))
        assert a.count() == b.count(), ds
        assert a.exceptAll(b).count() == 0, ds


def test_curate_corpus_every_stage_fires(spark):
    """End-to-end curation composition: each planted doc exercises one
    stage — gopher kill (too short), exact-dup kill (identical text,
    min id wins), near-dup kill (one-token variant, component min id
    wins), decontamination kill (shares a 3-gram with the benchmark),
    and clean survivors pass through with all columns."""
    from dgraph_dbpedia_spark.operators.cachectl import release
    from dgraph_dbpedia_spark.plans.curate import curate_corpus

    t_dup = "alpha beta gamma delta epsilon zeta"
    # long shared prefix so the banded MinHash candidate join fires
    # deterministically for these fixed texts (J ~ 0.88; banding is
    # probabilistic per-pair in general, deterministic per fixed text)
    t_near = (
        "red green blue yellow purple orange pink silver gold bronze "
        "copper iron steel zinc lead tin nickel cobalt"
    )
    docs = spark.createDataFrame(
        [
            (0, "en", "one two three"),                      # gopher: < 5 words
            (1, "en", t_dup),                                # survives (exact rep)
            (2, "en", t_dup),                                # exact dup of 1
            (3, "en", t_near),                               # survives (component rep)
            (4, "en", t_near.replace("cobalt", "chrome")),   # near-dup of 3
            (5, "en", "the secret eval phrase is here"),     # contaminated
            (6, "fr", "paris lyon nice marseille toulouse"), # clean survivor
        ],
        ["doc_id", "lang", "text"],
    )
    bench = spark.createDataFrame(
        [(0, "xx secret eval phrase yy")], ["bid", "text"]
    )
    out = curate_corpus(
        docs,
        benchmark=bench,
        gopher_kwargs=dict(
            min_words=5, max_words=1000, min_mean_word_len=1.0,
            max_mean_word_len=20.0, min_alpha_word_ratio=0.0,
            min_stopwords=0,
        ),
        near_dup_threshold=0.5,
        w=3,
        decontaminate_w=3,
    )
    rows = out.collect()
    release(out)
    assert out.columns == ["doc_id", "lang", "text"]
    assert sorted(r["doc_id"] for r in rows) == [1, 3, 6]
    # alpha stage: with temperature sampling on, the rarest lang (fr,
    # one doc) must keep its doc (rate 1.0)
    out2 = curate_corpus(
        docs,
        gopher_kwargs=dict(
            min_words=5, max_words=1000, min_mean_word_len=1.0,
            max_mean_word_len=20.0, min_alpha_word_ratio=0.0,
            min_stopwords=0,
        ),
        near_dup_threshold=0.5,
        w=3,
        alpha=0.5,
    )
    ids2 = sorted(r["doc_id"] for r in out2.collect())
    release(out2)
    assert 6 in ids2 and set(ids2) <= {1, 3, 5, 6}


def test_pretraining_prep_composition_seams(spark):
    """The curate -> chunk -> split -> epoch-shuffle composition's
    ordering contracts (the seams the oracle row pins at sf, checked
    here on a surgical fixture): chunks exist ONLY for curation
    survivors; every chunk of a doc carries the SAME split (doc-keyed
    coin — no train/val leakage); train rows get a dense per-shard
    (shard, pos) order with chunk-unique keys (no duplicate positions
    even when one doc contributes many chunks); non-train rows carry
    NULL shard/pos; and the whole frame is reproducible run-to-run."""
    from dgraph_dbpedia_spark.operators.cachectl import release
    from dgraph_dbpedia_spark.plans.curate import pretraining_prep

    long_doc = " ".join(f"tok{i}" for i in range(40))
    docs = spark.createDataFrame(
        [
            (0, "en", "one two three"),  # gopher kill: < 5 words
            (1, "en", long_doc),         # survivor, 40 tokens -> chunks
            (2, "en", long_doc),         # exact dup of 1 -> killed
            (3, "fr", " ".join(f"mot{i}" for i in range(20))),  # survivor
        ],
        ["doc_id", "lang", "text"],
    )
    kwargs = dict(
        gopher_kwargs=dict(
            min_words=5, max_words=1000, min_mean_word_len=1.0,
            max_mean_word_len=20.0, min_alpha_word_ratio=0.0,
            min_stopwords=0,
        ),
        near_dup_threshold=0.9,
        w=3,
        chunk_tokens=16,
        overlap=4,
        fractions={"train": 0.5, "val": 0.5},
        epoch=3,
        n_shards=2,
    )
    out = pretraining_prep(docs, **kwargs)
    rows = out.collect()
    release(out)
    assert out.columns == [
        "doc_id", "chunk_idx", "n_tokens", "split", "shard", "pos"
    ]
    # chunks only for survivors (0 gopher-killed, 2 exact-dup-killed)
    assert {r["doc_id"] for r in rows} == {1, 3}
    # 40 tokens at 16/4 (stride 12): starts 0,12,24 -> 3 chunks
    assert sorted(
        r["chunk_idx"] for r in rows if r["doc_id"] == 1
    ) == [0, 1, 2]
    # doc-keyed split: all chunks of a doc agree
    for d in (1, 3):
        assert len({r["split"] for r in rows if r["doc_id"] == d}) == 1
    train = [r for r in rows if r["split"] == "train"]
    rest = [r for r in rows if r["split"] != "train"]
    assert train, "fixture must land at least one doc in train"
    # train: per-shard positions dense from 1, chunk-unique keys
    by_shard: dict[int, list[int]] = {}
    for r in train:
        assert r["shard"] is not None and 0 <= r["shard"] < 2
        by_shard.setdefault(r["shard"], []).append(r["pos"])
    for positions in by_shard.values():
        assert sorted(positions) == list(range(1, len(positions) + 1))
    # non-train: NULL delivery order
    assert all(r["shard"] is None and r["pos"] is None for r in rest)
    # deterministic end to end
    out2 = pretraining_prep(docs, **kwargs)
    rows2 = out2.collect()
    release(out2)
    assert sorted(map(tuple, rows)) == sorted(map(tuple, rows2))


def test_pretraining_prep_validates_before_curating(spark):
    """Bad post-curate knobs must fail FAST (plan-construction time,
    before the expensive curation chain runs) and must not leak
    persisted frames."""
    import pytest

    from dgraph_dbpedia_spark.plans.curate import pretraining_prep

    docs = spark.createDataFrame(
        [(1, "en", "one two three four five six")],
        ["doc_id", "lang", "text"],
    )
    before = len(spark.sparkContext._jsc.getPersistentRDDs())
    with pytest.raises(ValueError):
        pretraining_prep(docs, chunk_tokens=16, overlap=16)
    with pytest.raises(ValueError):
        pretraining_prep(docs, fractions={"train": 0.9, "val": 0.9})
    with pytest.raises(ValueError):
        pretraining_prep(docs, n_shards=0)
    assert len(spark.sparkContext._jsc.getPersistentRDDs()) == before
