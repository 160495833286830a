"""Compaction-economics probe for the band-index ingestion gate.

Drives a long-lived ingest (default 60 micro-batches) through the gate's
foreachBatch body (`_band_index_gate_batch`) twice over identical input:

  * ``never``   — compaction disabled: the delta log grows one dir per
    batch, so the per-batch probe join lists and reads N prior deltas.
  * ``auto16``  — the production default: the batch body auto-compacts the
    committed log past COMPACT_DELTA_THRESHOLD (16) dirs.

Per batch it records the live log size (delta dirs visible before the
batch) and the batch wall time; the summary buckets batches by tens so
the growth law is readable, and asserts both configs produce identical
verdict sets (compaction must be verdict-invariant — also pytest-proven,
re-checked here because this probe is the sizing evidence for the
threshold).

Usage:  python tools/compaction_probe.py [--batches 60] [--sf DIR]
Prints one JSON line; a human table goes to stderr. Results are recorded
in PLANS.md (round-13 notes) — the basis for COMPACT_DELTA_THRESHOLD.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    n_batches = 60
    sf = SF_DIR
    argv = sys.argv[1:]
    if "--batches" in argv:
        n_batches = int(argv[argv.index("--batches") + 1])
    if "--sf" in argv:
        sf = argv[argv.index("--sf") + 1]

    from pyspark.sql import functions as F

    from mapreduce_simulation_spark.operators.dedup import (
        narrow_minhash_bands_arrow,
    )
    from mapreduce_simulation_spark.session import build_session
    from mapreduce_simulation_spark.streaming.stateful import (
        COMPACT_DELTA_THRESHOLD,
        _band_index_gate_batch,
        _index_delta_id,
    )

    spark = build_session("compaction-probe")
    docs = spark.read.parquet(os.path.join(sf, "documents.parquet"))
    # Stable round-robin split into micro-batches: banding is the
    # expensive stateless half and is NOT what this probe measures, so
    # band once and persist; each batch filters the persisted frame.
    banded = (
        narrow_minhash_bands_arrow(docs)
        .withColumn("_b", F.crc32(F.col("doc_id").cast("string")) % n_batches)
        .persist()
    )
    n_rows = banded.count()  # materialize before timing

    def run(config: str, compact_threshold: int | None, root: str) -> dict:
        index_root = os.path.join(root, "index")
        verdict_root = os.path.join(root, "verdicts")
        os.makedirs(index_root)
        os.makedirs(verdict_root)
        rows = []
        for b in range(n_batches):
            live = sum(
                _index_delta_id(d) is not None
                for d in os.listdir(index_root)
            )
            batch = banded.where(F.col("_b") == b).drop("_b")
            t0 = time.perf_counter()
            _band_index_gate_batch(
                batch,
                b,
                index_root,
                verdict_root,
                compact_threshold=compact_threshold,
            )
            rows.append(
                {"batch": b, "live_deltas": live,
                 "sec": round(time.perf_counter() - t0, 3)}
            )
        verdicts = spark.read.parquet(
            *(
                os.path.join(verdict_root, d)
                for d in sorted(os.listdir(verdict_root))
                if d.startswith("delta_")
            )
        )
        vhash = (
            verdicts.select(
                F.sum(
                    F.xxhash64("doc_id", "band", "dup").cast("decimal(38,0)")
                ).alias("h")
            ).collect()[0]["h"]
        )
        # decile buckets: median sec + max live delta count per bucket
        buckets = []
        for lo in range(0, n_batches, 10):
            chunk = rows[lo : lo + 10]
            secs = sorted(r["sec"] for r in chunk)
            buckets.append(
                {
                    "batches": f"{lo}-{lo + len(chunk) - 1}",
                    "median_sec": secs[len(secs) // 2],
                    "max_live_deltas": max(r["live_deltas"] for r in chunk),
                }
            )
        return {
            "config": config,
            "total_sec": round(sum(r["sec"] for r in rows), 2),
            "final_log_dirs": sum(
                _index_delta_id(d) is not None
                for d in os.listdir(index_root)
            ),
            "verdict_hash": str(vhash),
            "buckets": buckets,
        }

    out = {"sf": sf, "n_batches": n_batches, "banded_rows": n_rows,
           "threshold": COMPACT_DELTA_THRESHOLD, "runs": []}
    for config, thr in (("never", None), ("auto16", COMPACT_DELTA_THRESHOLD)):
        root = tempfile.mkdtemp(prefix=f"cprobe_{config}_")
        try:
            res = run(config, thr, root)
        finally:
            shutil.rmtree(root, ignore_errors=True)
        out["runs"].append(res)
        print(f"-- {config}: total {res['total_sec']}s, "
              f"final log dirs {res['final_log_dirs']}", file=sys.stderr)
        for bk in res["buckets"]:
            print(f"   batches {bk['batches']:>7s}: median "
                  f"{bk['median_sec']}s  live deltas ≤ "
                  f"{bk['max_live_deltas']}", file=sys.stderr)
    out["verdicts_identical"] = (
        out["runs"][0]["verdict_hash"] == out["runs"][1]["verdict_hash"]
    )
    print(json.dumps(out))
    banded.unpersist()
    spark.stop()


if __name__ == "__main__":
    main()
