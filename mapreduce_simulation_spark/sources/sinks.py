"""Sinks: part-file output with a controlled partition count (S4/S6).

The reference writes one `part-{NNNNN}` file per reducer into a fresh
output directory (worker/__main__.py:237-250; the manager rmtree+recreates
the directory per job, manager/__main__.py:344-355). Spark's writer already
emits `part-*` files; we pin the file count with repartition(n) and map the
rmtree semantics to mode("overwrite").

AQE note: adaptive coalescing may merge small output partitions; an
explicit repartition(n) immediately before write survives it (the exchange
is user-specified, not an optimizer artifact).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def write_part_files(
    df: DataFrame,
    output_directory: str,
    num_partitions: int,
    fmt: str = "text",
    key_partitioned: str | None = None,
) -> None:
    """Write ``df`` as exactly ``num_partitions`` part files, overwriting the
    output directory (the reference's per-job rmtree semantics).

    ``key_partitioned``: optionally hash-distribute rows by a key column so
    all rows of one key land in one part file — the reference's reducer
    output invariant (every key's group is processed by exactly one
    reducer).
    """
    out = df
    if fmt == "text" and len(df.columns) > 1:
        # text sink needs a single string column; keep the partition key
        # alongside until after the repartition, then drop it.
        line = F.concat_ws(
            "\t", *[F.col(c).cast("string") for c in df.columns]
        ).alias("value")
        keep = [line] + ([F.col(key_partitioned)] if key_partitioned else [])
        out = df.select(*keep)
    if key_partitioned is not None:
        out = out.repartition(num_partitions, F.col(key_partitioned))
        if fmt == "text" and "value" in out.columns and len(out.columns) > 1:
            out = out.select("value")
    else:
        out = out.repartition(num_partitions)
    writer = out.write.mode("overwrite")
    if fmt == "text":
        writer.text(output_directory)
    elif fmt == "parquet":
        writer.parquet(output_directory)
    elif fmt == "csv":
        writer.option("header", "true").csv(output_directory)
    elif fmt == "json":
        writer.json(output_directory)
    else:
        raise ValueError(f"unsupported format {fmt!r}")
