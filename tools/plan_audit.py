"""Scan every batch query's physical plan for scale red flags.

Red flags:
  CARTESIAN            — CartesianProduct (unbounded pair blowup)
  BNLJ                 — BroadcastNestedLoopJoin (fine ONLY when the
                         broadcast side is provably bounded: a 1-row
                         aggregate, a date spine, a dim interval set)
  MID_SINGLE_PARTITION — an Exchange SinglePartition that is not the
                         query's final presentation sort (a 1-row
                         aggregate exchange is fine; a mid-plan global
                         funnel of fact data is not)

The audit prints one line per flagged query; intentional patterns are
expected to be documented at the operator (the round-9 audit verified
each flagged site's docstring carries its bounded-side argument —
PLANS.md "Round-9: window plan audit"). Streaming queries are skipped
(their plans only exist per micro-batch).

Usage: python tools/plan_audit.py [name ...]   (default: all batch queries)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

SF_DIR = os.environ.get("AUDIT_SF_DIR", "/root/testdata/sf0.001")


def main() -> int:
    import __spark_entry__ as e
    from mapreduce_simulation_spark.operators.caching import release_tracked
    from mapreduce_simulation_spark.session import build_session

    spark = build_session("plan-audit")
    qs = e.queries()
    only = set(sys.argv[1:])
    n_flagged = n_checked = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        if name.startswith("streaming_") or name.startswith("stateful_"):
            continue
        try:
            df = fn(spark, SF_DIR)
            plan = df._jdf.queryExecution().executedPlan().toString()
        except Exception as ex:  # noqa: BLE001
            print(f"ERR   {name}: {str(ex)[:100]}")
            continue
        finally:
            release_tracked()
        n_checked += 1
        flags = []
        if "CartesianProduct" in plan:
            flags.append("CARTESIAN")
        if "BroadcastNestedLoopJoin" in plan:
            flags.append("BNLJ")
        lines = plan.split("\n")
        if any(
            "SinglePartition" in ln and "Exchange" in ln for ln in lines[3:]
        ):
            flags.append("MID_SINGLE_PARTITION")
        if flags:
            n_flagged += 1
            print(f"FLAG  {name}: {','.join(flags)}")
    print(f"AUDIT {n_checked} plans, {n_flagged} flagged")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
