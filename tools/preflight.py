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
