"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is executed to completion (count() forces the full plan without
shipping rows to the driver — the sink cost we want is compute+shuffle, not
driver serialization). A warm-up query runs first so JVM/codegen startup
isn't attributed to the first benchmark entry.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Headline set: scan-heavy agg, multi-join, window, sessionization, text,
# plus the LLM-pipeline operators as they land.
HEADLINE = [
    "word_count",
    "pricing_summary",
    "revenue_by_nation",
    "top_orders",
    "left_outer_order_counts",
    "window_top_customers",
    "events_daily",
    "sessionize_events",
    "text_stats",
    "dedup_exact",
    "dedup_minhash_lsh",
    "similarity_topk",
    "similarity_topk_pandas",
    "similarity_ivf_topk",
    "salted_supplier_revenue",
    "promo_revenue_ratio",
    # stateful_user_rollup intentionally NOT here: its wall time is fixed
    # streaming-machinery cost (stage write, checkpoint dir, state-store
    # init), not data throughput — it would dominate the total without
    # measuring anything that scales. The driver's correctness gate still
    # runs it with every registered query.
]


def main() -> None:
    import __spark_entry__ as e
    from mapreduce_simulation_spark.session import build_session

    spark = build_session("bench")
    qs = e.queries()
    m = re.search(r"sf([\d.]+)", SF_DIR)
    sf = float(m.group(1)) if m else None

    # Warm up: session init, whole-stage codegen, shuffle machinery, and
    # parquet footers for each table family — otherwise the first measured
    # query absorbs multi-second one-time JVM costs.
    qs["top_orders"](spark, SF_DIR).count()
    qs["word_count"](spark, "/root/testdata/sf0.001").count()
    qs["revenue_by_nation"](spark, "/root/testdata/sf0.001").count()
    qs["events_daily"](spark, "/root/testdata/sf0.001").count()
    # Spawn the Python worker pool so Arrow-path queries measure steady
    # state, not daemon startup.
    qs["similarity_topk_pandas"](spark, "/root/testdata/sf0.001").count()
    # The two most stage-heavy plans: compile their codegen (identical
    # generated code at any SF) so the measured run is throughput, not
    # Janino compile time.
    qs["dedup_minhash_lsh"](spark, "/root/testdata/sf0.001").count()
    qs["similarity_ivf_topk"](spark, "/root/testdata/sf0.001").count()

    timings: dict[str, float] = {}
    for name in HEADLINE:
        if name not in qs:
            continue
        t0 = time.perf_counter()
        qs[name](spark, SF_DIR).count()
        timings[name] = round(time.perf_counter() - t0, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
