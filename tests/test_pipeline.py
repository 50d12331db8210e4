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
