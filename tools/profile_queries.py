"""Ad-hoc same-session A/B profiler: time selected queries() entries at
$SPARK_GRAFT_SF_DIR exactly the way bench.py does (warm session, noop
sink, plan+execute timed). Usage:

    python tools/profile_queries.py q1 q2 ... [--iters N]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry_mod
from dgraph_dbpedia_spark.session import build_session


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("names", nargs="+", help="queries() entry names to time")
    parser.add_argument("--iters", type=int, default=3)
    ns = parser.parse_args()
    args, iters = ns.names, ns.iters
    qs_all = entry_mod.queries()
    unknown = [n for n in args if n not in qs_all]
    if unknown:
        parser.error(
            f"unknown queries: {unknown}; available: {sorted(qs_all)}"
        )
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = build_session(app_name="profile")
    spark.sparkContext.setLogLevel("ERROR")
    qs = qs_all
    # warm-up (mirrors bench.py)
    from pyspark.sql import functions as F

    w = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(100)
    w.groupBy("lang").count().write.format("noop").mode("overwrite").save()

    for name in args:
        fn = qs[name]
        for i in range(iters):
            start = time.perf_counter()
            df = fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            print(f"{name} iter{i}: {time.perf_counter() - start:.3f}s", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
