"""Dump `.explain("formatted")` for named queries to plans/<round>/<query>_<tag>.txt.

Usage: python tools/dump_plans.py --tag before --round r18 q1 [q2 ...]
       python tools/dump_plans.py --tag before --round r18 --benched

--benched dumps every query that appears in any bench.py group (the
optimization-round evidence set). Streaming queries are skipped: their
plans only exist per micro-batch (the committed dump would be the drained
batch result's trivial scan), matching tools/plan_audit.py's rule.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> int:
    args = list(sys.argv[1:])

    def take(flag: str, default=None):
        if flag in args:
            i = args.index(flag)
            args.pop(i)
            return args.pop(i)
        return default

    tag = take("--tag", "before")
    rnd = take("--round", "r18")
    benched = "--benched" in args
    if benched:
        args.remove("--benched")

    import bench as b
    import __spark_entry__ as e
    from mapreduce_simulation_spark.operators.caching import release_tracked
    from mapreduce_simulation_spark.session import build_session

    names = list(args)
    if benched:
        for grp in (
            b.HEADLINE, b.EXTENDED, b.TRAINING, b.PIPELINE, b.SKETCH,
            b.SKETCH_R12, b.SKETCH_R13, b.CURATION_R14, b.QA_R15,
            b.QA_R16, b.QA_R17,
        ):
            names.extend(n for n in grp if n not in names)

    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans", rnd,
    )
    os.makedirs(out_dir, exist_ok=True)
    spark = build_session("dump-plans")
    qs = e.queries()
    for name in names:
        if name not in qs:
            print(f"SKIP {name}: not registered")
            continue
        if name.startswith("streaming_") or name.startswith("stateful_"):
            print(f"SKIP {name}: streaming (plans exist per micro-batch)")
            continue
        try:
            df = qs[name](spark, SF_DIR)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as ex:  # noqa: BLE001
            print(f"ERR  {name}: {str(ex)[:160]}")
            continue
        finally:
            release_tracked()
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({plan.count('Exchange')} Exchange occurrences)")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
