"""Split the slow composition queries' wall into construct / optimize
/ execute. Usage: python tools/attr_planning.py [query ...] (sf via $SPARK_GRAFT_SF_DIR;
defaults to the two composed-pipeline rows). Times three phases per
run: DataFrame construction (includes any EAGER operator work, e.g.
the curate chains component step), Catalyst analysis+optimization+
physical planning (executedPlan), and noop-sink execution. r16 used
it to show the composed rows are construction-bound (eager
clustering), not planning-bound."""
import os, sys, time
sys.path.insert(0, "/root/repo")
import __spark_entry__ as entry_mod
from dgraph_dbpedia_spark.session import build_session
from dgraph_dbpedia_spark.operators.cachectl import release

sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
names = sys.argv[1:] or ["pretraining_prep", "curation_pipeline"]
spark = build_session(app_name="attr-planning")
spark.sparkContext.setLogLevel("ERROR")
qs = entry_mod.queries()
# warm JIT/session paths
spark.read.parquet(f"{sf_dir}/documents.parquet").limit(10).count()
for name in names:
    for it in range(3):
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        df = qs[name](spark, sf_dir)
        t1 = time.perf_counter()
        # force analysis+optimization+physical planning without execution
        _ = df._jdf.queryExecution().executedPlan()
        t2 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        t3 = time.perf_counter()
        release(df)
        print(f"{name} run{it}: construct={t1-t0:6.2f}s plan={t2-t1:6.2f}s "
              f"exec={t3-t2:6.2f}s total={t3-t0:6.2f}s")
spark.stop()
