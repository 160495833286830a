"""Speculative execution for stragglers — the reference's slow-worker half.

The reference's Q5 scenario runs deliberately slowed executables
(tests/testdata/exec/wc_map_slow.sh:12, wc_reduce_slow.sh:15 sleep mid-
stream) and relies on the manager tolerating slow-but-alive workers. Spark
subsumes that with ``spark.speculation``: the scheduler watches running
tasks against the median runtime of finished ones, marks stragglers
speculatable, and launches a duplicate attempt, taking whichever copy
finishes first.

Three Spark facts shape what a one-box test can prove:
  - ``local[N]`` never speculates — TaskSchedulerImpl.start() only starts
    the speculation thread when ``!isLocal`` — so the demo runs in
    ``local-cluster`` mode (real executor JVMs, isLocal=false).
  - the duplicate may not be placed on a host that already has an attempt
    of the task (TaskSetManager.dequeueSpeculativeTask requires
    ``!hasAttemptOnHost``) and every executor here shares one host, so the
    *launch* half only manifests on a real multi-host cluster.
  - neither the event log nor AppStatusListener records speculative
    submissions (no onSpeculativeTaskSubmitted handler in either), so the
    marking is observed directly: the driver polls the live
    TaskSetManager.speculatableTasks set through py4j while the straggler
    is still sleeping.

Asserted: the scheduler marks the straggler speculatable during the run,
the slowed task is slow-not-dead (exactly one attempt per partition), and
the result is identical to the unslowed query.

Runs in a subprocess: speculation confs are cluster-level and the shared
test session (a process-global SparkContext) is built without them.
local-cluster needs SPARK_HOME; the pip-installed pyspark dir serves.
"""

from __future__ import annotations

import os
import subprocess
import sys

SLEEP_S = 10  # straggler sleep: >> multiplier x median of the fast tasks

SCRIPT = rf"""
import sys, threading, time
sys.path.insert(0, sys.argv[1])
from mapreduce_simulation_spark.session import build_session
from mapreduce_simulation_spark.tables import load_table
from pyspark import TaskContext

spark = build_session(
    "speculation-demo", master="local-cluster[2,2,1024]",
    shuffle_partitions=4,
    extra_conf={{
        "spark.speculation": "true",
        "spark.speculation.interval": "100ms",
        # 3 of 4 tasks finish in well under a second; the 4th exceeds
        # 1.2x their median runtime almost immediately.
        "spark.speculation.quantile": "0.5",
        "spark.speculation.multiplier": "1.2",
        "spark.speculation.efficiency.enabled": "false",
    }})

attempts = spark.sparkContext.accumulator(0)

def straggle(it):
    ctx = TaskContext.get()
    attempts.add(1)
    if ctx.partitionId() == 0 and ctx.attemptNumber() == 0:
        time.sleep({SLEEP_S})  # slow, not dead — wc_map_slow.sh's shape
    for pdf in it:
        yield pdf[["doc_id", "n_chars"]]

docs = load_table(spark, sys.argv[2], "documents").repartition(4, "doc_id")
result = {{}}
def run():
    result["rows"] = sorted(
        (r.doc_id, r.n_chars)
        for r in docs.mapInPandas(
            straggle, schema="doc_id long, n_chars long").collect())
worker = threading.Thread(target=run)
worker.start()

# Poll the live scheduler state for the speculatable marking while the
# straggler sleeps (py4j reaches private[spark] members — public bytecode).
sched = spark.sparkContext._jsc.sc().taskScheduler()
marked = 0
deadline = time.monotonic() + {SLEEP_S} + 15
while time.monotonic() < deadline and worker.is_alive() and not marked:
    try:
        queue = sched.rootPool().getSortedTaskSetQueue()
        for i in range(queue.size()):
            marked = max(marked, queue.apply(i).speculatableTasks().size())
    except Exception:
        pass  # taskset may complete between size() and apply()
    time.sleep(0.2)
worker.join()

want = sorted((r.doc_id, r.n_chars)
              for r in load_table(spark, sys.argv[2], "documents")
              .select("doc_id", "n_chars").collect())
assert result["rows"] == want, "straggler result diverged"
assert marked >= 1, "straggler was never marked speculatable"
# slow-not-dead, and same-host placement blocks the duplicate locally:
# exactly one attempt per partition actually ran
assert attempts.value == 4, f"unexpected attempts: {{attempts.value}}"
print(f"SPECULATION_OK marked={{marked}}")
spark.stop()
"""


def test_straggler_is_marked_speculatable():
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sf_dir = os.environ.get("TEST_SF_DIR", "/root/testdata/sf0.001")
    env = dict(os.environ)
    env.setdefault(
        "SPARK_HOME",
        os.path.dirname(os.path.abspath(__import__("pyspark").__file__)),
    )
    proc = subprocess.run(
        [sys.executable, "-c", SCRIPT, repo, sf_dir],
        capture_output=True,
        text=True,
        timeout=300,
        env=env,
    )
    assert "SPECULATION_OK" in proc.stdout, (
        proc.stdout[-2000:] + proc.stderr[-2000:]
    )
