"""Dump `.explain("formatted")` for named registry rows to files —
the before/after plan evidence the optimization rounds commit under
plans/r<N>/.

Usage: python tools/dump_plans.py <out_dir> <suffix> <query> [query ...]
(sf via $SPARK_GRAFT_SF_DIR, default /root/testdata/sf0.001; writes
<out_dir>/<query>_<suffix>.txt)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry_mod
from dgraph_dbpedia_spark.session import build_session


def main() -> None:
    out_dir, suffix, names = sys.argv[1], sys.argv[2], sys.argv[3:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    os.makedirs(out_dir, exist_ok=True)
    spark = build_session(app_name="dump-plans")
    spark.sparkContext.setLogLevel("ERROR")
    from dgraph_dbpedia_spark.operators.cachectl import release

    for name in names:
        df = entry_mod.QUERIES[name](spark, sf_dir)
        txt = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(txt)
        release(df)
        print(f"wrote {path} ({len(txt)} bytes)")
    spark.stop()


if __name__ == "__main__":
    main()
