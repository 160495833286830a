"""`eventlog_stream` — a custom STREAMING Python DataSource (Spark 4).

The batch half of the connector-extensibility surface is sources/kvtext.py
(the reference's key/value text format); this is the streaming half: a
`DataSourceStreamReader` that TAILS a growing directory of parquet files,
with parquet ROW GROUPS as the offset unit.

Why row groups: they are the format's native split point, so

  - the offset is a single integer (global row-group index over the
    sorted file list) — trivially JSON-serializable, replayable, monotone;
  - `partitions(start, end)` maps each micro-batch to its row-group span,
    and each `read(partition)` runs ON AN EXECUTOR reading exactly one
    row group via pyarrow into ONE Arrow RecordBatch — the vectorized
    path, no row-at-a-time Python, no driver data movement (this is the
    `DataSourceStreamReader` API, not `SimpleDataSourceStreamReader`,
    whose `read` runs on the driver);
  - `latestOffset` re-lists the directory each trigger, so files appended
    to the log become new offsets and the stream keeps tailing.

Append-only contract: existing files are immutable and new files must
sort (by name) strictly after every already-indexed file — otherwise the
global row-group numbering would shift and committed offsets would mean
different data. The reader enforces this and fails loudly on violation
(the same contract every file-tailing source has, made explicit).

Restart correctness: offsets are deterministic functions of the sorted
file list, and the engine replans `partitions(committed_end, latest)`
from its own checkpoint after recovery — the reader keeps NO progress
state of its own, which is what makes kill-and-restart exactly-once
(driven end-to-end in tests/test_streaming_multimodal.py). Per-trigger
rate limiting (maxFilesPerTrigger-style) is a JVM `ReadLimit` feature
the Python DataSource API does not currently expose; the batch size here
is bounded instead by how much new data each trigger finds.

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
        self.path = path
        # Driver-side, footer-only: the global row-group index. At 100 TB
        # this is |files| footer reads of a few KiB each (the same
        # listing cost every file source pays), not a data scan.
        self._files: list[str] = []
        self._index: list[tuple[str, int]] = []
        self._refresh()

    def _refresh(self) -> None:
        import pyarrow.parquet as pq

        current = _list_parquet(self.path)
        if current[: len(self._files)] != self._files:
            raise ValueError(
                "eventlog_stream: append-only contract violated — a new "
                "file sorts before an already-indexed one (or an indexed "
                "file disappeared); committed offsets would be remapped"
            )
        for f in current[len(self._files) :]:
            for rg in range(pq.ParquetFile(f).metadata.num_row_groups):
                self._index.append((f, rg))
        self._files = current

    def initialOffset(self) -> dict:
        return {"idx": 0}

    def latestOffset(self) -> dict:
        # Availability, not progress: re-list the directory so appended
        # files become new offsets (log tailing). The reader holds no
        # progress state — after a restart the engine replans from its
        # checkpointed committed offset against this same deterministic
        # index, which is what makes recovery exactly-once.
        self._refresh()
        return {"idx": len(self._index)}

    def partitions(self, start: dict, end: dict):
        # Always re-validate the sorted-prefix invariant (not just when the
        # index must grow): a fresh driver replanning committed offsets
        # from a checkpoint must fail loudly if the directory changed
        # underneath it, never silently map offsets to different row
        # groups than the run that committed them.
        self._refresh()
        if end["idx"] > len(self._index):
            raise ValueError(
                "eventlog_stream: committed offset "
                f"{end['idx']} exceeds the {len(self._index)} indexed row "
                "groups — files this offset range was committed against "
                "are gone; refusing to replan against a shrunken log"
            )
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
