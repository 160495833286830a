"""Clean-host solo re-measurement of specific queries — the verdict-item
protocol used to close/confirm single-query perf movers (r12:
sessionize_events; r14: the similarity_topk_pandas creep and the
salted/promo/events movers).

Replicates bench.py's measurement path exactly (same warmups, noop-sink
forcing, release_tracked between runs), but for a named subset, printing
cold + N warm samples per query so a creep can be separated from host
noise without paying for a full bench pass.

Usage: python tools/solo_measure.py q1 [q2 ...] [--n 3] [--sf DIR]
Prints one JSON line: {"queries": {name: {"cold": s, "warm": [s...]}}}
Run it several times in FRESH processes for a cross-process median.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    args = list(sys.argv[1:])
    n = 3
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    if "--n" in args:
        i = args.index("--n")
        args.pop(i)
        n = int(args.pop(i))
    if "--sf" in args:
        i = args.index("--sf")
        args.pop(i)
        sf = args.pop(i)
    names = args
    if not names:
        print("usage: solo_measure.py q1 [q2 ...] [--n 3] [--sf DIR]")
        return 2

    import __spark_entry__ as e
    from mapreduce_simulation_spark.operators.caching import release_tracked
    from mapreduce_simulation_spark.session import build_session

    spark = build_session("solo-measure")
    qs = e.queries()
    # bench.py's warmup set — identical forcing path
    for wname, wsf in (
        ("top_orders", sf),
        ("word_count", "/root/testdata/sf0.001"),
        ("revenue_by_nation", "/root/testdata/sf0.001"),
        ("events_daily", "/root/testdata/sf0.001"),
        ("similarity_topk_pandas", "/root/testdata/sf0.001"),
        ("dedup_minhash_lsh", "/root/testdata/sf0.001"),
        ("similarity_ivf_topk", "/root/testdata/sf0.001"),
    ):
        try:
            qs[wname](spark, wsf).write.format("noop").mode(
                "overwrite"
            ).save()
        except Exception as exc:  # noqa: BLE001
            print(f"warmup {wname} failed: {exc}", file=sys.stderr)
    t0 = time.perf_counter()
    qs["pricing_summary"](spark, "/root/testdata/sf0.001").count()
    calib = round(time.perf_counter() - t0, 3)

    out: dict[str, dict] = {}
    for name in names:
        samples = []
        t0 = time.perf_counter()
        qs[name](spark, sf).write.format("noop").mode("overwrite").save()
        cold = round(time.perf_counter() - t0, 3)
        release_tracked()
        for _ in range(n):
            t0 = time.perf_counter()
            qs[name](spark, sf).write.format("noop").mode(
                "overwrite"
            ).save()
            samples.append(round(time.perf_counter() - t0, 3))
            release_tracked()
        out[name] = {"cold": cold, "warm": samples}
        print(f"{name}: cold {cold}s warm {samples}", file=sys.stderr)
    print(json.dumps({"sf": sf, "calib": calib, "queries": out}))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
