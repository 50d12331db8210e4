"""Command-line entry points mirroring the reference's three Spark apps
(SURVEY §3): ``ingest`` (DbpediaToParquetSparkApp), ``transform``
(DbpediaDgraphSparkApp), ``partition`` (PartitionSparkApp).

Usage:
    python -m dgraph_dbpedia_spark ingest <ttl_root> <out_dir> [--languages de,en] [--datasets labels,...]
    python -m dgraph_dbpedia_spark transform <parquet_dir> <out_dir> [--languages de,en]
        [--externalise-uris] [--remove-language-tags] [--top-k 100] [--no-types]
    python -m dgraph_dbpedia_spark partition <parquet_path> <out_dir> --languages de,en
"""

from __future__ import annotations

import argparse
import sys

from dgraph_dbpedia_spark.session import build_session


def _split(value: str | None) -> list[str] | None:
    if not value:
        return None
    return [v for v in value.split(",") if v]


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(prog="dgraph_dbpedia_spark")
    sub = parser.add_subparsers(dest="cmd", required=True)

    p_ingest = sub.add_parser("ingest", help="ttl -> partitioned parquet")
    p_ingest.add_argument("root")
    p_ingest.add_argument("out")
    p_ingest.add_argument("--languages")
    p_ingest.add_argument("--datasets")

    p_tr = sub.add_parser("transform", help="parquet -> dgraph rdf + schema")
    p_tr.add_argument("path")
    p_tr.add_argument("out")
    p_tr.add_argument("--languages")
    p_tr.add_argument("--externalise-uris", action="store_true")
    p_tr.add_argument("--remove-language-tags", action="store_true")
    p_tr.add_argument("--top-k", type=int, default=100)
    p_tr.add_argument("--no-types", action="store_true")

    p_part = sub.add_parser("partition", help="range-partitioned sorted write demo")
    p_part.add_argument("path")
    p_part.add_argument("out")
    p_part.add_argument("--languages", required=True)

    args = parser.parse_args(argv)
    spark = build_session(app_name=f"dgraph_dbpedia_spark-{args.cmd}")
    try:
        if args.cmd == "ingest":
            from dgraph_dbpedia_spark.plans.ingest import ingest

            results = ingest(
                spark, args.root, args.out,
                languages=_split(args.languages), datasets=_split(args.datasets),
            )
            for r in results:
                s = r.stats
                print(
                    f"{r.dataset}: {s.get('triples', 0):,} triples, "
                    f"{s.get('nodes', 0):,} nodes, {s.get('predicates', 0):,} predicates"
                )
        elif args.cmd == "transform":
            from dgraph_dbpedia_spark.plans.transform import TransformConfig, transform

            outputs = transform(
                spark, args.path, args.out,
                languages=_split(args.languages),
                cfg=TransformConfig(
                    write_types=not args.no_types,
                    externalise_uris=args.externalise_uris,
                    remove_language_tags=args.remove_language_tags,
                    top_infobox_properties_per_lang=args.top_k or None,
                ),
            )
            for name, df in outputs.items():
                print(f"{name}: {df.count():,} triples")
        elif args.cmd == "partition":
            from dgraph_dbpedia_spark.plans.partition import partition_demo

            partition_demo(spark, args.path, args.out, _split(args.languages))
            print(f"wrote {args.out}")
    finally:
        spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
