"""Mechanical scan of EVERY registered query's physical plan for the
single-task global-sort smell: an `Exchange SinglePartition` feeding a
Sort/Window. The per-query plan-shape tests assert this for known plans;
this tool proves the property across the whole registry, so a future
operator can't reintroduce the pattern unnoticed.

Run: python tools/window_lint.py [sf_dir]   (default sf0.001 — plan shapes
don't change with SF, only AQE runtime decisions do, and this inspects the
pre-execution plan).

Exit code 1 if any non-whitelisted query plans a SinglePartition exchange
into a Sort or Window node.

Whitelisted queries are inspected by hand — each moves a bounded number
of summary rows (one per table / FK edge) through the flagged exchange.
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

WHITELIST: dict[str, str] = {
    # Scalar aggregates: partial per partition, ONE row through the
    # SinglePartition exchange; the Sort the lint sees is the declared
    # tiny final ORDER BY over per-table/per-edge summary rows.
    "table_checksum": "one summary row per table through the exchange",
    "referential_audit": "one orphan-count row per FK edge",
    "gated_dedup_pipeline": (
        "six one-row global-count terms unioned, then the tiny final "
        "ORDER BY — corpus-scale work is below the partial aggregates "
        "(documented at the operator docstring, r10)"
    ),
    "feature_drift_stats": (
        "the cumulative-CDF window runs over the bucket table — ≤ "
        "domain/width ≈ 122 rows bounded by the price domain, not the "
        "data; the raw scan aggregates below it (operators/drift.py, r13)"
    ),
}

# Streaming queries execute eagerly on call (they drain a stream) — plan
# inspection would run the whole query; they have no batch plan to lint.
SKIP_PREFIXES = ("streaming_", "stateful_user_")


def main() -> int:
    from mapreduce_simulation_spark.session import build_session
    import __spark_entry__ as e

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = build_session("window-lint")
    qs = e.queries()
    bad: list[tuple[str, str]] = []
    n_checked = 0
    for name, fn in qs.items():
        if name.startswith(SKIP_PREFIXES):
            continue
        try:
            df = fn(spark, sf_dir)
            plan = df._jdf.queryExecution().executedPlan().toString()
        except Exception as exc:  # noqa: BLE001 - report, don't die
            bad.append((name, f"PLAN ERROR: {str(exc).splitlines()[0][:120]}"))
            continue
        n_checked += 1
        # A SinglePartition exchange directly feeding Sort or Window: the
        # plan string lists children below parents, so look for the
        # adjacency Sort/Window ... Exchange SinglePartition within a few
        # lines (tree indentation guarantees the exchange prints after the
        # operator it feeds).
        lines = plan.splitlines()
        for i, ln in enumerate(lines):
            if "Exchange SinglePartition" not in ln:
                continue
            above = " ".join(lines[max(0, i - 3):i])
            if re.search(r"\b(Sort|Window|WindowGroupLimit)\b", above):
                if name in WHITELIST:
                    break
                bad.append((name, ln.strip()[:120]))
                break
    print(f"checked {n_checked} batch queries")
    if bad:
        print("\nsingle-partition sort/window smells:")
        for name, detail in bad:
            print(f"  {name}: {detail}")
        spark.stop()
        return 1
    print("no single-partition Sort/Window exchanges outside the whitelist")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
