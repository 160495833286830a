"""Measure per-query shuffle and input volumes at sf0.1 — the evidence
behind the "shuffle-minimal" claims in PLANS.md/ARCHITECTURE.md. Uses the
Spark status REST API (UI enabled just for this tool): for each headline
query, the delta in completed-stage totals gives input bytes read, shuffle
bytes written, and records shuffled. A query whose shuffle volume is a
tiny fraction of its input is scan-bound and scales linearly; one that
shuffles ~its input size needs the co-location/bucketing levers at 100 TB.

Run: python tools/shuffle_audit.py   (prints a markdown table)

Scaling mode: python tools/shuffle_audit.py <sf_dir_small> <sf_dir_big>
runs every headline query at both scale factors and prints the shuffle-byte
growth ratio next to the data growth ratio. A query whose shuffle grows
much slower than the data (group-cardinality- or vocab-bounded aggregates)
is shuffle-safe at 100 TB; one whose shuffle tracks the data linearly needs
its co-location lever (bucketing, broadcast, pre-aggregation) called out.
"""

from __future__ import annotations

import json
import os
import sys
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mapreduce_simulation_spark.session import build_session
import __spark_entry__ as e
from bench import HEADLINE, SF_DIR


def stage_totals(base: str, app_id: str) -> tuple[int, int, int]:
    url = f"{base}/api/v1/applications/{app_id}/stages?status=complete"
    stages = json.load(urllib.request.urlopen(url))
    return (
        sum(s.get("inputBytes", 0) for s in stages),
        sum(s.get("shuffleWriteBytes", 0) for s in stages),
        sum(s.get("shuffleWriteRecords", 0) for s in stages),
    )


def fmt_bytes(n: int) -> str:
    for unit in ("B", "KiB", "MiB", "GiB"):
        if n < 1024 or unit == "GiB":
            return f"{n:.1f} {unit}" if unit != "B" else f"{n} B"
        n /= 1024
    return f"{n:.1f} GiB"


def _measure(spark, base, app_id, qs, sf_dir: str) -> dict[str, tuple[int, int, int]]:
    names = (
        os.environ["SHUFFLE_AUDIT_QUERIES"].split(",")
        if "SHUFFLE_AUDIT_QUERIES" in os.environ
        else HEADLINE
    )
    out = {}
    for name in names:
        if name not in qs:
            continue
        before = stage_totals(base, app_id)
        qs[name](spark, sf_dir).count()
        after = stage_totals(base, app_id)
        out[name] = (
            after[0] - before[0],
            after[1] - before[1],
            after[2] - before[2],
        )
    return out


def main() -> None:
    spark = build_session(
        "shuffle-audit", extra_conf={"spark.ui.enabled": "true"}
    )
    base = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId
    qs = e.queries()

    if len(sys.argv) == 3:
        small_dir, big_dir = sys.argv[1], sys.argv[2]
        small = _measure(spark, base, app_id, qs, small_dir)
        big = _measure(spark, base, app_id, qs, big_dir)
        print(f"Shuffle scaling {small_dir} → {big_dir}\n")
        # Input-byte deltas are NOT printed in this mode: the UI's
        # FileSystem read counters are JVM-global and bleed across the two
        # runs sharing this session, so per-query input growth is
        # unreliable here; shuffle counters are per-stage and exact.
        print("| query | shuffle @small | shuffle @big | shuffle ×growth |")
        print("|---|---|---|---|")
        for name in small:
            _, sw_s, _ = small[name]
            _, sw_b, _ = big[name]
            sw_g = f"{sw_b / sw_s:.1f}×" if sw_s else ("flat" if not sw_b else "n/a")
            print(f"| {name} | {fmt_bytes(sw_s)} | {fmt_bytes(sw_b)} | {sw_g} |")
        spark.stop()
        return

    print(f"Shuffle audit at {SF_DIR} ({len(HEADLINE)} headline queries)\n")
    print("| query | input read | shuffle written | shuffle records | shuffle/input |")
    print("|---|---|---|---|---|")
    for name, (inp, sw, recs) in _measure(
        spark, base, app_id, qs, SF_DIR
    ).items():
        ratio = f"{sw / inp:.2%}" if inp else "n/a"
        print(
            f"| {name} | {fmt_bytes(inp)} | {fmt_bytes(sw)} | {recs:,} | {ratio} |"
        )
    spark.stop()


if __name__ == "__main__":
    main()
