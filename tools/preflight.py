"""Replay the driver's per-round checks locally, in one command.

The driver grades three surfaces: (1) entry(spark) smoke at sf0.001,
(2) the FIRST 50 entries of queries() hash-compared against oracle_sql()
via DuckDB at sf0.01, (3) bench.py at sf0.1. Round 3 failed all three from
one uncommitted bug; this tool exists so a single local run proves the
round is safe to end.

Usage:
  python tools/preflight.py            # entry + window-50 (fast-ish)
  python tools/preflight.py --bench    # also run the full bench

Exit code 0 = everything the driver checks is green.
"""

from __future__ import annotations

import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DRIVER_WINDOW = 50
SMOKE_SF = "/root/testdata/sf0.001"
MAX_STALE_ROUNDS = 5  # 224 names / 50 slots → full refresh every ≤5 windows


def _next_window_draft(root: str) -> tuple[set[str], str | None]:
    """Parse the newest ``Round-N window DRAFT`` fenced block from PLANS.md.

    Late-round registrations are queued for the NEXT round's window via a
    committed draft (rotation policy, registry.py); a never-driver-green
    name is only genuinely unqueued — real rotation drift — if neither the
    current window nor that draft will refresh it (r16 verdict item 5).
    Returns (names, "rN" tag) or (set(), None) when no draft exists.
    """
    import re

    try:
        text = open(os.path.join(root, "PLANS.md")).read()
    except OSError:
        return set(), None
    best: tuple[int, set[str]] | None = None
    for m in re.finditer(
        r"^## Round-(\d+) window DRAFT.*?```\n(.*?)```", text, re.M | re.S
    ):
        rnum = int(m.group(1))
        block = {ln.strip() for ln in m.group(2).splitlines() if ln.strip()}
        if best is None or rnum > best[0]:
            best = (rnum, block)
    if best is None:
        return set(), None
    return best[1], f"r{best[0]}"


def _staleness_check(
    window: set[str], names: set[str]
) -> tuple[list[str], str]:
    """Replay CORRECTNESS_r*.json for each name's newest hash-green round.

    Returns (violations, human_note). Violations are non-empty only once
    cumulative coverage is complete (every registry name has at least one
    green row — before that the gap IS the rotation queue, reported in the
    note instead) and only for names the current window does not refresh.
    """
    import glob
    import json
    import re

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    latest: dict[str, int] = {}
    rounds: list[int] = []
    for path in sorted(glob.glob(os.path.join(root, "CORRECTNESS_r*.json"))):
        rnum = int(re.search(r"r(\d+)", os.path.basename(path)).group(1))
        rounds.append(rnum)
        try:
            data = json.load(open(path))
        except (OSError, json.JSONDecodeError):
            continue
        for name, row in data.items():
            if isinstance(row, dict) and row.get("hash_match"):
                latest[name] = max(latest.get(name, 0), rnum)
    if not rounds:
        return [], "staleness: no CORRECTNESS files — skipped"
    upcoming = max(rounds) + 1  # the round the current window targets
    never = sorted(n for n in names if n not in latest)
    if never:
        draft, draft_tag = _next_window_draft(root)
        unqueued = sorted(
            n for n in never if n not in window and n not in draft
        )
        scope = "the upcoming window" + (
            f" or the committed {draft_tag} draft" if draft_tag else ""
        )
        note = (
            f"staleness: coverage {len(names) - len(never)}/{len(names)} — "
            f"{len(never)} never driver-green ({len(unqueued)} of them NOT "
            f"in {scope}{': ' + ', '.join(unqueued[:8]) if unqueued else ''})"
        )
        return [], note
    stale = sorted(
        n
        for n in names
        if n not in window and upcoming - latest[n] > MAX_STALE_ROUNDS
    )
    # default guards the degenerate registry-fits-in-window case (every
    # name in-window → empty generator must read as "nothing stale", not
    # a ValueError that turns preflight into a crash).
    oldest = min(
        (latest[n] for n in names if n not in window), default=upcoming
    )
    note = (
        f"staleness: coverage {len(names)}/{len(names)}, oldest "
        f"out-of-window green r{oldest} vs upcoming r{upcoming} "
        f"(budget {MAX_STALE_ROUNDS}); {len(stale)} violations"
    )
    return stale, note


def main() -> int:
    import __spark_entry__ as e

    failures: list[str] = []

    # (1) entry smoke — the driver collects the result and checks schema.
    from mapreduce_simulation_spark.session import build_session

    spark = build_session("preflight")
    try:
        df = e.entry(spark)
        n = df.count()
        if n <= 0:
            failures.append(f"entry(): {n} rows")
        print(f"entry(): {n} rows, schema {df.schema.simpleString()}")
    except Exception as exc:  # noqa: BLE001
        failures.append(f"entry(): {exc}")
    finally:
        spark.stop()

    # (2) the driver's correctness window, via the same comparison
    # verify_local implements (row count + columns + value hash).
    window = list(e.queries())[:DRIVER_WINDOW]
    no_oracle = [q for q in window if q not in e.oracle_sql()]
    if no_oracle:
        failures.append(f"window queries without oracle: {no_oracle}")
    proc = subprocess.run(
        [sys.executable, "tools/verify_local.py", *window],
        capture_output=True,
        text=True,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    ok = sum(line.startswith(("OK", "ROWS")) for line in proc.stdout.splitlines())
    bad = [
        line
        for line in proc.stdout.splitlines()
        if line.startswith(("FAIL", "ERR"))
    ]
    print(f"window-{DRIVER_WINDOW}: {ok} green, {len(bad)} red (rc={proc.returncode})")
    for line in bad:
        print(f"  {line}")
    if proc.returncode != 0 or bad:
        failures.append(f"window verification red: {bad or proc.returncode}")

    # (2b) oracle-dtype / container lint over the window at sf0.001 —
    # catches the two classes of driver-only failure that slipped past
    # value-identical local checks in r10 (HUGEINT→float64 widening and
    # unhashable ARRAY outputs) BEFORE the driver sees them. Full-registry
    # sweep with --dtypes-full.
    lint_args = [sys.executable, "tools/oracle_dtype_audit.py", SMOKE_SF]
    if "--dtypes-full" not in sys.argv:
        lint_args += window
    lint = subprocess.run(
        lint_args,
        capture_output=True,
        text=True,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    lint_bad = [
        line
        for line in lint.stdout.splitlines()
        if line.startswith(("MISM", "CONT", "COL", "OBJ", "ERR"))
    ]
    tail = lint.stdout.strip().splitlines()[-1] if lint.stdout.strip() else ""
    print(f"dtype-lint: rc={lint.returncode} {tail}")
    for line in lint_bad:
        print(f"  {line}")
    if lint.returncode != 0 or lint_bad:
        failures.append(f"oracle dtype lint red: {lint_bad or lint.returncode}")

    # (2c) driver-check staleness burn-down (r13 verdict item 5): once
    # every registry name has at least one hash-green driver row, the
    # rotation must stay mechanical — fail if any name's NEWEST green row
    # is more than MAX_STALE_ROUNDS behind the upcoming round AND the
    # current window doesn't refresh it. 224 names / 50 slots means pure
    # staleness rotation refreshes every name within 5 windows, so 5 is
    # exactly the budget an unbroken rotation satisfies.
    stale_fail, stale_note = _staleness_check(set(window), set(e.queries()))
    print(stale_note)
    if stale_fail:
        failures.append(f"driver-check staleness: {stale_fail}")

    # (3) bench — optional, the slow part.
    if "--bench" in sys.argv:
        bench = subprocess.run(
            [sys.executable, "bench.py"],
            capture_output=True,
            text=True,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        )
        last = bench.stdout.strip().splitlines()[-1] if bench.stdout.strip() else ""
        print(f"bench: rc={bench.returncode} {last[:200]}")
        if bench.returncode != 0:
            failures.append(f"bench rc={bench.returncode}")

    print("PREFLIGHT " + ("FAIL: " + "; ".join(failures) if failures else "PASS"))
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
