"""Measure per-query shuffle and input volumes at sf0.1 — the evidence
behind the "shuffle-minimal" claims in PLANS.md/ARCHITECTURE.md. Uses the
Spark status REST API (UI enabled just for this tool): for each headline
query, the delta in completed-stage totals gives input bytes read, shuffle
bytes written, and records shuffled. A query whose shuffle volume is a
tiny fraction of its input is scan-bound and scales linearly; one that
shuffles ~its input size needs the co-location/bucketing levers at 100 TB.

Run: python tools/shuffle_audit.py   (prints a markdown table)
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


def main() -> None:
    spark = build_session(
        "shuffle-audit", extra_conf={"spark.ui.enabled": "true"}
    )
    base = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId
    qs = e.queries()

    print(f"Shuffle audit at {SF_DIR} ({len(HEADLINE)} headline queries)\n")
    print("| query | input read | shuffle written | shuffle records | shuffle/input |")
    print("|---|---|---|---|---|")
    for name in HEADLINE:
        if name not in qs:
            continue
        before = stage_totals(base, app_id)
        qs[name](spark, SF_DIR).count()
        after = stage_totals(base, app_id)
        inp = after[0] - before[0]
        sw = after[1] - before[1]
        recs = after[2] - before[2]
        ratio = f"{sw / inp:.2%}" if inp else "n/a"
        print(
            f"| {name} | {fmt_bytes(inp)} | {fmt_bytes(sw)} | {recs:,} | {ratio} |"
        )
    spark.stop()


if __name__ == "__main__":
    main()
