"""Run any registered query by name — the migrating user's entry point.

    python tools/run_query.py <name> [more names...] [options]

Options:
    --sf DIR      table directory (default /root/testdata/sf0.01, or
                  $SPARK_GRAFT_SF_DIR)
    --explain     print the formatted physical plan instead of rows
    --oracle      also run the DuckDB oracle and report match/mismatch
    --rows N      rows to show (default 20)
    --list [pat]  list registered query names (optionally filtered)

Examples:
    python tools/run_query.py pricing_summary
    python tools/run_query.py bm25_topk --explain
    python tools/run_query.py dedup_minhash_lsh --sf /root/testdata/sf0.1
    python tools/run_query.py word_count grep --oracle
    python tools/run_query.py --list dedup
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings".split()
)


def main() -> int:
    args = [a for a in sys.argv[1:]]

    def take_opt(flag: str, default=None):
        if flag in args:
            i = args.index(flag)
            args.pop(i)
            return args.pop(i) if flag in ("--sf", "--rows") else True
        return default

    sf_dir = take_opt("--sf") or os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"
    )
    explain = bool(take_opt("--explain"))
    oracle = bool(take_opt("--oracle"))
    n_rows = int(take_opt("--rows") or 20)
    listing = bool(take_opt("--list"))

    from mapreduce_simulation_spark.plans import registry

    qs = registry.queries()
    if listing:
        pat = args[0].lower() if args else ""
        for name, fn in qs.items():
            if pat in name.lower():
                doc = (fn.__doc__ or "").strip().split("\n")[0]
                print(f"{name:40s} {doc}")
        return 0
    if not args:
        print(__doc__)
        return 2
    unknown = [n for n in args if n not in qs]
    if unknown:
        print(f"unknown queries: {unknown} (see --list)")
        return 2

    from mapreduce_simulation_spark.session import build_session

    spark = build_session("run-query")
    try:
        rc = 0
        for name in args:
            df = qs[name](spark, sf_dir)
            print(f"== {name} @ {sf_dir}")
            if explain:
                df.explain("formatted")
                continue
            df.show(n_rows, truncate=False)
            print(f"({df.count()} rows total)")
            if oracle:
                sql = registry.oracle_sql().get(name)
                if sql is None:
                    print("   no oracle (rows-only query)")
                    continue
                import duckdb

                con = duckdb.connect()
                for t in TABLES:
                    con.execute(
                        f"CREATE VIEW {t} AS "
                        f"SELECT * FROM '{sf_dir}/{t}.parquet'"
                    )
                orows = con.execute(sql).fetchall()
                srows = df.collect()
                ok = len(orows) == len(srows)
                print(
                    f"   oracle: {len(orows)} rows — "
                    + ("row-count MATCH" if ok else "row-count MISMATCH")
                    + " (full value comparison: tools/verify_local.py)"
                )
                if not ok:
                    rc = 1
        return rc
    finally:
        spark.stop()


if __name__ == "__main__":
    raise SystemExit(main())
