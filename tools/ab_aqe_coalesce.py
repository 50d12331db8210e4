"""A/B the per-row fixed cost against AQE coalescing aggressiveness
(VERDICT r16 #4): the 169-row suite is overhead-bound at sf0.1 — 8
cores beat 32 — and the suspected floor is task count per exchange
(shuffle.partitions = $SPARK_GRAFT_CPUS, with AQE's default
``parallelismFirst=true`` keeping tiny exchanges wide instead of
coalescing them to the 64m advisory size).

Measures one cheap registry row (approx_distinct_nodes) warm best-of-N
under three runtime confs in ONE session, and dumps the final
(post-AQE) plan for each so the AQEShuffleRead coalescing is visible:

  A. session defaults (parallelismFirst=true)
  B. parallelismFirst=false (advisory size governs -> tiny exchanges
     collapse to few tasks)
  C. shuffle.partitions=1 (lower bound: what the row costs with no
     task-count overhead at all)

Usage: SPARK_GRAFT_CPUS=32 python tools/ab_aqe_coalesce.py [iters]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry_mod
from dgraph_dbpedia_spark.session import build_session

ROW = "approx_distinct_nodes"


def sample(spark, sf_dir: str, iters: int) -> dict:
    execs = []
    for i in range(iters + 1):
        spark.catalog.clearCache()
        df = entry_mod.QUERIES[ROW](spark, sf_dir)
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        if i:
            execs.append(round(dt, 3))
        final_plan = df._jdf.queryExecution().executedPlan().toString()
    return {"exec_best": min(execs), "exec": execs, "final_plan": final_plan}


def main() -> None:
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    spark = build_session(app_name=f"ab-aqe-coalesce-{cpus}c")
    spark.sparkContext.setLogLevel("ERROR")

    out: dict[str, dict] = {"cpus": cpus}

    spark.conf.set("spark.sql.adaptive.coalescePartitions.parallelismFirst", "true")
    out["A_defaults"] = sample(spark, sf_dir, iters)

    spark.conf.set("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
    out["B_coalesce_first"] = sample(spark, sf_dir, iters)

    spark.conf.set("spark.sql.adaptive.coalescePartitions.parallelismFirst", "true")
    spark.conf.set("spark.sql.shuffle.partitions", "1")
    out["C_one_partition"] = sample(spark, sf_dir, iters)

    plans = {k: v.pop("final_plan") for k, v in out.items() if isinstance(v, dict) and "final_plan" in v}
    print(json.dumps(out))
    for k, p in plans.items():
        print(f"===== final plan {k} =====")
        print(p)
    spark.stop()


if __name__ == "__main__":
    main()
