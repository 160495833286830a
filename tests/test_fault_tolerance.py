"""Task-replay parity with the reference's fault tolerance.

The reference detects dead workers and reassigns their tasks from a saved
copy (reference manager/__main__.py:294-311 fault_tolerance_thread,
:474-482 append_failed_task; scenario tests/test_manager_05.py). In Spark
that machinery is the scheduler's task retry: a failed task re-executes
from lineage, and because tasks are deterministic/idempotent the job's
result is unchanged — asserted here with a real injected failure.

Runs in a subprocess because retries need ``local[N, maxFailures]``
master syntax and the shared test session is already created with
maxFailures=1 (a SparkContext is process-global).
"""

from __future__ import annotations

import os
import subprocess
import sys

SCRIPT = r"""
import sys
sys.path.insert(0, sys.argv[1])
from mapreduce_simulation_spark.session import build_session
from mapreduce_simulation_spark.tables import load_table
from pyspark import TaskContext
from pyspark.sql import functions as F

# local[2,2]: 2 threads, 2 attempts per task — retries enabled.
spark = build_session("fault-tolerance", master="local[2,2]",
                      shuffle_partitions=4)

def flaky(it):
    ctx = TaskContext.get()
    # First attempt of partition 0 dies mid-task — after the scan has
    # started, like a worker crashing between heartbeats.
    if ctx.partitionId() == 0 and ctx.attemptNumber() == 0:
        raise RuntimeError("injected worker failure")
    for pdf in it:
        yield pdf[["doc_id", "n_chars"]]

docs = load_table(spark, sys.argv[2], "documents").repartition(4, "doc_id")
out = docs.mapInPandas(flaky, schema="doc_id long, n_chars long")
got = sorted((r.doc_id, r.n_chars) for r in out.collect())
want = sorted((r.doc_id, r.n_chars)
              for r in load_table(spark, sys.argv[2], "documents")
              .select("doc_id", "n_chars").collect())
assert got == want, f"replayed result diverged: {len(got)} vs {len(want)}"
print("RETRY_OK", len(got))
spark.stop()
"""


def test_task_failure_replays_and_result_is_unchanged():
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sf_dir = os.environ.get("TEST_SF_DIR", "/root/testdata/sf0.001")
    proc = subprocess.run(
        [sys.executable, "-c", SCRIPT, repo, sf_dir],
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert "RETRY_OK" in proc.stdout, proc.stdout[-2000:] + proc.stderr[-2000:]
    # the injected failure really happened (attempt 0 raised, attempt 1 ran)
    assert "injected worker failure" in proc.stderr
