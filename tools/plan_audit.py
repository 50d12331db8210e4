"""Registry-wide physical-plan audit (r16, guide §7.2): for every
``queries()`` entry, summarize the red-flag surface of its executed
plan — Exchange count, join strategies, Python evaluation nodes,
cartesian products, and whether parquet scans carry pushed filters /
pruned schemas. Complements tests/test_plans.py (which *gates* the
Python nodes) with a one-page inventory the optimization round can
diff.

Usage: python tools/plan_audit.py [sf_dir] [query ...]
"""

from __future__ import annotations

import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry_mod
from dgraph_dbpedia_spark.session import build_session

FLAGS = (
    "BatchEvalPython", "ArrowEvalPython", "MapInPandas",
    "FlatMapGroupsInPandas", "MapInArrow", "CartesianProduct",
)
JOINS = (
    "BroadcastHashJoin", "SortMergeJoin", "ShuffledHashJoin",
    "BroadcastNestedLoopJoin",
)


def main() -> None:
    argv = sys.argv[1:]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.001"
    only = set(argv[1:])
    spark = build_session(app_name="plan-audit")
    spark.sparkContext.setLogLevel("ERROR")
    from dgraph_dbpedia_spark.operators.cachectl import release

    report = {}
    for name, fn in entry_mod.queries().items():
        if only and name not in only:
            continue
        try:
            df = fn(spark, sf_dir)
            plan = df._jdf.queryExecution().executedPlan().toString()
        except Exception as e:  # noqa: BLE001
            report[name] = {"error": f"{type(e).__name__}: {e}"[:200]}
            continue
        row = {
            "exchanges": plan.count("Exchange"),
            "joins": {j: plan.count(j) for j in JOINS if j in plan},
            "flags": [f for f in FLAGS if f in plan],
            "scans": plan.count("FileScan"),
            "pushed": len(re.findall(r"PushedFilters: \[[^\]]", plan)),
        }
        report[name] = row
        try:
            release(df)
        except Exception:  # noqa: BLE001
            pass
    spark.stop()
    print(json.dumps(report, indent=1, sort_keys=True))


if __name__ == "__main__":
    main()
