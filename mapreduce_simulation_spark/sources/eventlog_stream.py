"""`eventlog_stream` — a custom STREAMING Python DataSource (Spark 4).

The batch half of the connector-extensibility surface is sources/kvtext.py
(the reference's key/value text format); this is the streaming half: a
`DataSourceStreamReader` that replays a parquet event log in deterministic
micro-batches with parquet ROW GROUPS as the offset unit.

Why row groups: they are the format's native split point, so

  - offsets are a single integer (global row-group index) — trivially
    JSON-serializable, replayable, and monotone;
  - `partitions(start, end)` maps each batch to its row groups, and each
    `read(partition)` runs ON AN EXECUTOR reading exactly one row group
    via pyarrow into ONE Arrow RecordBatch — the vectorized path, no
    row-at-a-time Python, no driver data movement (this is the
    `DataSourceStreamReader` API, not `SimpleDataSourceStreamReader`,
    whose `read` runs on the driver);
  - rate limiting falls out: `latestOffset` advances at most
    MAX_RGS_PER_BATCH row groups per trigger (the maxFilesPerTrigger
    pattern), so a backlogged 100 TB log drains in bounded micro-batches
    instead of one giant batch.

Timestamps are emitted as epoch-microsecond BIGINTs (`ts_us`): the
driver's events.parquet has shipped as both TIMESTAMP(NANOS) and
timestamp[us] across rounds (TESTDATA.md / tables.py), and an integer
column is immune to both the Arrow nanos conversion trap and session-
timezone drift.

File→offset assignment is sorted-name order — the same deterministic
contract as the reference's file→mapper assignment
(reference manager/__main__.py:330-334) and sources/kvtext.py.
"""

from __future__ import annotations

import os

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)

SCHEMA = (
    "event_id bigint, user_id bigint, event_type string, "
    "value double, ts_us bigint"
)
MAX_RGS_PER_BATCH = 2


def _list_parquet(path: str) -> list[str]:
    if os.path.isfile(path):
        return [path]
    return sorted(
        os.path.join(path, f)
        for f in os.listdir(path)
        if f.endswith(".parquet") and not f.startswith(("_", "."))
    )


class EventLogStreamDataSource(DataSource):
    """Registers as ``eventlog_stream``; fixed event-log schema."""

    @classmethod
    def name(cls) -> str:
        return "eventlog_stream"

    def schema(self) -> str:
        return SCHEMA

    def streamReader(self, schema) -> "EventLogStreamReader":
        return EventLogStreamReader(self.options)


class EventLogStreamReader(DataSourceStreamReader):
    def __init__(self, options) -> None:
        path = options.get("path")
        if not path:
            raise ValueError(
                "eventlog_stream requires a path: .load(<parquet dir>)"
            )
        import pyarrow.parquet as pq

        # Driver-side, footer-only: the global row-group index. At 100 TB
        # this is |files| footer reads of a few KiB each (the same
        # listing cost every file source pays), not a data scan.
        self._index: list[tuple[str, int]] = []
        for f in _list_parquet(path):
            for rg in range(pq.ParquetFile(f).metadata.num_row_groups):
                self._index.append((f, rg))
        if not self._index:
            raise ValueError(f"eventlog_stream: no parquet data in {path}")
        self._pos = 0

    def initialOffset(self) -> dict:
        return {"idx": 0}

    def latestOffset(self) -> dict:
        # Advance the visible end at most MAX_RGS_PER_BATCH row groups per
        # trigger: bounded micro-batches over any backlog. The stream is
        # drained when this stops advancing (processAllAvailable returns).
        self._pos = min(len(self._index), self._pos + MAX_RGS_PER_BATCH)
        return {"idx": self._pos}

    def partitions(self, start: dict, end: dict):
        return [
            InputPartition(self._index[i])
            for i in range(start["idx"], end["idx"])
        ]

    def read(self, partition):
        # Executor-side: one row group → one Arrow RecordBatch.
        import pyarrow as pa
        import pyarrow.parquet as pq

        file, rg = partition.value
        tbl = pq.ParquetFile(file).read_row_group(
            rg, columns=["event_id", "user_id", "event_type", "value", "ts"]
        )
        ts_us = tbl.column("ts").cast(pa.timestamp("us")).cast(pa.int64())
        batch_cols = [
            tbl.column("event_id").cast(pa.int64()),
            tbl.column("user_id").cast(pa.int64()),
            tbl.column("event_type").cast(pa.string()),
            tbl.column("value").cast(pa.float64()),
            ts_us,
        ]
        yield from pa.table(
            batch_cols,
            names=["event_id", "user_id", "event_type", "value", "ts_us"],
        ).to_batches()

    def commit(self, end: dict) -> None:
        pass


def register_eventlog_stream(spark) -> None:
    """Idempotently register the connector on a session."""
    spark.dataSource.register(EventLogStreamDataSource)
