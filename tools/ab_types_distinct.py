"""A/B the types.rdf distinct formulations over WARM retained caches
(r16): v0 = the shipped one-tag-one-distinct union fold; v1 = the
r14/r15-prescribed per-frame dropDuplicates before the union fold.
Result (600k subjects, warm caches): v0 2.86 s vs v1 5.90 s — the
prescription adds nine exchanges and still needs the final distinct,
so it was rejected with numbers (OPTIMIZATION_r16.md). Also times the
cache warm (14.9 s — the real critical-path cost) and write_rdf.

Usage: python tools/ab_types_distinct.py [n_subjects]"""
import os, sys, tempfile, shutil, time
sys.path.insert(0, "/root/repo")
from functools import reduce
from dgraph_dbpedia_spark.session import build_session
from dgraph_dbpedia_spark.benchgen import generate_ttl_corpus, LANGS
from dgraph_dbpedia_spark.plans.ingest import ingest
from dgraph_dbpedia_spark.plans import transform as T
from pyspark.sql import DataFrame, functions as F
from pyspark import StorageLevel

n_subjects = int(sys.argv[1]) if len(sys.argv) > 1 else 600_000
spark = build_session(app_name="types-iso")
spark.sparkContext.setLogLevel("ERROR")
work = tempfile.mkdtemp(prefix="sparkgraft-typesiso-")
try:
    generate_ttl_corpus(spark, f"{work}/ttl", n_subjects)
    ingest(spark, f"{work}/ttl", f"{work}/parquet", print_stats=False)
    cfg = T.TransformConfig(write_types=True, externalise_uris=True,
                            remove_language_tags=True,
                            top_infobox_properties_per_lang=100, print_stats=False)
    path = f"{work}/parquet"
    languages = T.get_languages(list(LANGS))
    label_triples = T.read_triples_parquet(spark, f"{path}/labels.parquet", languages)
    all_infobox = T.read_triples_parquet(spark, f"{path}/infobox_properties.parquet", languages)
    all_interlang = T.read_triples_parquet(spark, f"{path}/interlanguage_links.parquet", languages)
    interlang_triples = T.filter_interlang_objects(all_interlang, languages)
    page_links_triples = T.read_triples_parquet(spark, f"{path}/page_links.parquet", languages)
    category_triples = T.read_triples_parquet(spark, f"{path}/article_categories.parquet", languages)
    skos_triples = T.read_triples_parquet(spark, f"{path}/skos_categories.parquet", languages)
    geo_triples = T.read_triples_parquet(spark, f"{path}/geo_coordinates.parquet", languages).where(F.col("p") == T.GEORSS_POINT)
    topk, predicate_datatypes, schema_derived, dim_caches = T.infobox_dims(all_infobox, 100)
    infobox_triples = T.filter_by_topk(all_infobox, topk)
    typed = T.typed_triples(infobox_triples)
    infobox = T.clean_infobox(typed, predicate_datatypes, True)
    labels = T.clean_labels(label_triples, cfg)
    interlang = T.clean_uri_pairs(interlang_triples, cfg)
    page_links = T.clean_uri_pairs(page_links_triples, cfg)
    categories = T.clean_uri_pairs(category_triples, cfg)
    skos = T.clean_skos(skos_triples, cfg)
    geo = T.clean_geo(geo_triples, cfg)
    frames = [("labels", labels), ("infobox_properties", infobox),
              ("interlanguage_links", interlang), ("page_links", page_links),
              ("article_categories", categories), ("skos_categories", skos),
              ("geo_coordinates", geo)]
    retained = {n: f.persist(StorageLevel.DISK_ONLY) for n, f in frames}
    t0 = time.perf_counter()
    for n, f in retained.items():
        f.count()
    print(f"cache warm: {time.perf_counter()-t0:.2f}s")

    pre = {n: T.invalid_predicate_filter(f) for n, f in retained.items()}
    def articles_frames():
        return [pre[n].select("s", "lang") for n in
                ("labels", "infobox_properties", "interlanguage_links",
                 "page_links", "article_categories", "geo_coordinates")
                ] + [pre["interlanguage_links"].select(F.col("o").alias("s"), "lang")]

    def v0():
        return T.type_triples(articles_frames(),
                              pre["article_categories"].select(F.col("o").alias("s"), "lang"),
                              pre["skos_categories"].select("s", "lang"))

    def v1():  # per-frame pre-dedup before the union fold (r14/r15 prescription)
        tag = lambda df, c: df.withColumn("cls", F.lit(c).cast("tinyint"))
        arts = [f.dropDuplicates(["s", "lang"]) for f in articles_frames()]
        cats = pre["article_categories"].select(F.col("o").alias("s"), "lang").dropDuplicates(["s", "lang"])
        sk = pre["skos_categories"].select("s", "lang").dropDuplicates(["s", "lang"])
        tagged = reduce(DataFrame.unionByName,
                        [tag(f, 0) for f in arts] + [tag(cats, 1), tag(sk, 2)]).distinct()
        return tagged.select("s", F.lit("<dgraph.type>").alias("p"),
                             F.when(F.col("cls") == 0, F.lit('"Article"'))
                             .when(F.col("cls") == 1, F.lit('"Category"'))
                             .otherwise(F.lit('"Concept"')).alias("o"), "lang")

    for name, fn in (("v0-distinct", v0), ("v1-preagg", v1), ("v0-again", v0)):
        for it in range(2):
            t0 = time.perf_counter()
            df = fn()
            n = df.count()
            dt = time.perf_counter() - t0
            print(f"{name} run{it}: count={n} {dt:.2f}s")
    # write phase cost (persist+count+write), v0
    t0 = time.perf_counter()
    T.write_rdf(spark, v0(), f"{work}/rdf/types.rdf")
    print(f"v0 write_rdf total: {time.perf_counter()-t0:.2f}s")
finally:
    shutil.rmtree(work, ignore_errors=True)
    spark.stop()
