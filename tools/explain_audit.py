"""Dump executedPlan for the bench headline queries (evidence for PLANS.md)."""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from mapreduce_simulation_spark.session import build_session
import __spark_entry__ as e
from bench import HEADLINE, SF_DIR

spark = build_session("explain-audit")
qs = e.queries()
for name in HEADLINE + ["asof_join_purchases", "range_join_promos"]:
    if name not in qs:
        continue
    df = qs[name](spark, SF_DIR)
    print(f"\n{'='*20} {name} {'='*20}")
    print(df._jdf.queryExecution().executedPlan().toString())
spark.stop()
