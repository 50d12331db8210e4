"""Per-row fixed-cost attribution (VERDICT r16 #4): why did 8 cores
beat 32 on the 169-row suite total at sf0.1?

Runs a handful of cheap registry rows warm (best of N) at the core
count given by $SPARK_GRAFT_CPUS, splitting each sample into PLAN time
(queries[name](spark, sf) returning the DataFrame — pure driver:
analysis, optimization) and EXEC time (noop write), and dumps one
row's formatted plan so the shuffle-partition / AQE-coalesce shape is
checkable. Run it twice (SPARK_GRAFT_CPUS=8 / =32) and diff.

Usage: SPARK_GRAFT_CPUS=32 python tools/fixed_cost_probe.py [iters]
(sf dir via $SPARK_GRAFT_SF_DIR, default /root/testdata/sf0.1)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry_mod
from dgraph_dbpedia_spark.session import build_session

ROWS = [
    "approx_distinct_nodes",
    "triple_counts_by_lang",
    "predicate_histogram",
]


def main() -> None:
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    spark = build_session(app_name=f"fixed-cost-{cpus}c")
    spark.sparkContext.setLogLevel("ERROR")

    out: dict[str, dict] = {}
    for name in ROWS:
        if name not in entry_mod.QUERIES:
            continue
        plan_s, exec_s = [], []
        for i in range(iters + 1):
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            df = entry_mod.QUERIES[name](spark, sf_dir)
            t1 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            t2 = time.perf_counter()
            if i:  # first pass = warm-up
                plan_s.append(round(t1 - t0, 3))
                exec_s.append(round(t2 - t1, 3))
        out[name] = {
            "plan_best": min(plan_s), "exec_best": min(exec_s),
            "plan": plan_s, "exec": exec_s,
        }
    df = entry_mod.QUERIES[ROWS[0]](spark, sf_dir)
    df.write.format("noop").mode("overwrite").save()  # finalize AQE
    plan_txt = df._jdf.queryExecution().executedPlan().toString()
    print(json.dumps({
        "cpus": cpus,
        "shuffle_partitions": spark.conf.get("spark.sql.shuffle.partitions"),
        "results": out,
    }))
    print(plan_txt)
    spark.stop()


if __name__ == "__main__":
    main()
