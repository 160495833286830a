"""Adjudicate per-query bench regressions from committed artifacts alone.

BENCH_r08 is the per-query baseline for noop-forced numbers (README
"Benchmark"; r1-r7 used count() forcing and are not comparable). This
tool compares any later round's BENCH_r{N}.json against the baseline
with calibration normalization — each query's seconds divided by that
round's spark_calib_sec — so host-speed drift divides out and a flagged
row means the QUERY changed, not the machine.

Usage:
    python tools/bench_compare.py BENCH_r09.json [--baseline BENCH_r08.json]
                                  [--threshold 1.3]

Prints one row per query whose normalized ratio (new/baseline) exceeds
the threshold (regression) or falls below its inverse (win), plus the
totals. Exit code 0 always — this adjudicates, it does not gate.
"""

from __future__ import annotations

import json
import sys


def _load(path: str) -> dict:
    with open(path) as f:
        d = json.load(f)
    # driver artifacts wrap the JSON line under "parsed"; raw bench.py
    # output is the object itself
    return d.get("parsed", d)


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    opts = {
        a.split("=", 1)[0]: a.split("=", 1)[1]
        for a in sys.argv[1:]
        if a.startswith("--") and "=" in a
    }
    if not args:
        print(__doc__)
        return 0
    new = _load(args[0])
    base = _load(opts.get("--baseline", "BENCH_r08.json"))
    thr = float(opts.get("--threshold", "1.3"))

    nc, bc = new.get("spark_calib_sec"), base.get("spark_calib_sec")
    if not nc or not bc:
        print("missing spark_calib_sec in one side; cannot normalize")
        return 0

    def merged(d: dict) -> dict:
        out = dict(d.get("queries", {}))
        out.update(d.get("extended", {}))
        return out

    nq, bq = merged(new), merged(base)
    rows = []
    for name in sorted(set(nq) & set(bq)):
        n_norm, b_norm = nq[name] / nc, bq[name] / bc
        if b_norm <= 0:
            continue
        ratio = n_norm / b_norm
        if ratio >= thr or ratio <= 1 / thr:
            rows.append((ratio, name, bq[name], nq[name]))
    for ratio, name, bsec, nsec in sorted(rows, reverse=True):
        kind = "REGRESSION" if ratio > 1 else "WIN"
        print(
            f"{kind:10s} {name:32s} x{ratio:5.2f} normalized "
            f"({bsec}s -> {nsec}s raw)"
        )
    if not rows:
        print(f"no per-query move beyond x{thr} normalized")
    tn = new.get("calib_normalized_total")
    tb = base.get("calib_normalized_total")
    if tn and tb:
        print(f"headline normalized total: {tb} -> {tn} (x{tn / tb:.2f})")
    en = new.get("calib_normalized_extended")
    eb = base.get("calib_normalized_extended")
    if en and eb:
        print(f"extended normalized total: {eb} -> {en} (x{en / eb:.2f})")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
