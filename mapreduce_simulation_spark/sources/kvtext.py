"""`kvtext` — the reference's native key/value text format as a
first-class Spark connector (Python DataSource API, Spark 4).

The reference's intermediate and final files are lines of
``key<TAB>value`` (reference worker/__main__.py:182-184 splits with
``line.partition("\t")``); its manager assigns whole files to map tasks
(manager/__main__.py:330-334). This connector reproduces both contracts
at the engine level instead of ad-hoc post-processing:

  - ``spark.read.format("kvtext").load(dir)`` → DataFrame[key, value]
  - one InputPartition per file, files in sorted name order — the
    reference's deterministic file→mapper assignment;
  - each file is parsed once and handed to the JVM as ONE Arrow
    RecordBatch (the vectorized DataSource path), not row-at-a-time
    Python tuples.

This is the connector-extensibility surface: the same skeleton reads any
custom format a migrating user still has on disk. For formats Spark
already speaks (text/CSV/JSON/parquet/ORC), the built-in sources remain
the fast path — `as_kv` over `spark.read.text` stays the recommended
route for hot queries because the whole parse then lives in codegen.

Filesystem contract: tasks write temp files where they RUN and commit()
renames on the DRIVER, so the output path must be a SHARED filesystem
(NFS, fuse-mounted object store) on a multi-host cluster — the same
assumption every Hadoop file committer makes, and exactly what the
reference assumes of its output_directory (single host there). The
local-cluster test exercises the cross-process half (separate executor
JVMs on one box, tests/test_local_cluster_connectors.py).
"""

from __future__ import annotations

import os

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamWriter,
    DataSourceWriter,
    InputPartition,
    WriterCommitMessage,
)


class KVTextDataSource(DataSource):
    """Registers as ``kvtext``; schema is fixed to (key, value) strings."""

    @classmethod
    def name(cls) -> str:
        return "kvtext"

    def schema(self) -> str:
        return "key string, value string"

    def reader(self, schema) -> "KVTextReader":
        return KVTextReader(self.options)

    def writer(self, schema, overwrite: bool) -> "KVTextWriter":
        return KVTextWriter(self.options, overwrite)

    def streamWriter(self, schema, overwrite: bool) -> "KVTextStreamWriter":
        return KVTextStreamWriter(self.options)


class KVTextReader(DataSourceReader):
    def __init__(self, options) -> None:
        path = options.get("path")
        if not path:
            raise ValueError("kvtext requires a path: .load(<directory>)")
        self.path = path

    def partitions(self):
        # Whole-file partitions in sorted name order — the reference's
        # file→mapper contract. (Files are assumed splittable only at
        # file granularity, like the reference's.)
        files = sorted(
            os.path.join(self.path, f)
            for f in os.listdir(self.path)
            if not f.startswith(("_", "."))
            and os.path.isfile(os.path.join(self.path, f))
        )
        return [InputPartition(f) for f in files]

    def read(self, partition):
        import pyarrow as pa

        keys: list[str] = []
        values: list[str] = []
        with open(partition.value, encoding="utf-8") as fh:
            for line in fh:
                key, _, value = line.rstrip("\n").partition("\t")
                keys.append(key)
                values.append(value)
        yield pa.RecordBatch.from_arrays(
            [pa.array(keys, type=pa.string()), pa.array(values, type=pa.string())],
            names=["key", "value"],
        )


def register_kvtext(spark) -> None:
    """Idempotently register the connector on a session."""
    spark.dataSource.register(KVTextDataSource)


class KVTextCommit(WriterCommitMessage):
    def __init__(self, file: str) -> None:
        self.file = file


class KVTextWriter(DataSourceWriter):
    """Write side of the contract: each task emits one ``part-{NNNNN}``
    file of tab-joined lines (the reference's reducer output,
    worker/__main__.py:237-250), named by its partition id so the file
    set mirrors the task set. Tasks write to a per-ATTEMPT temp file
    (partition id + task attempt id, so speculative or retried attempts
    never share a temp path) and commit() renames the winning attempt's
    file — the standard two-phase output commit."""

    def __init__(self, options, overwrite: bool) -> None:
        path = options.get("path")
        if not path:
            raise ValueError("kvtext requires a path: .save(<directory>)")
        self.path = path
        if overwrite and os.path.isdir(path):
            import shutil

            shutil.rmtree(path)
        os.makedirs(path, exist_ok=True)

    def write(self, iterator) -> "KVTextCommit":
        from pyspark import TaskContext

        ctx = TaskContext.get()
        pid = ctx.partitionId()
        tmp = os.path.join(
            self.path, f".part-{pid:05d}.attempt-{ctx.taskAttemptId()}.tmp"
        )
        with open(tmp, "w", encoding="utf-8") as fh:
            for row in iterator:
                fh.write("\t".join("" if v is None else str(v) for v in row))
                fh.write("\n")
        return KVTextCommit(tmp)

    def commit(self, messages) -> None:
        for m in messages:
            # strip only the leading '.' and the '.attempt-*.tmp' suffix of
            # the FILENAME (the directory path must pass through untouched)
            name = os.path.basename(m.file)
            final_name = "part-" + name[len(".part-"):].split(".attempt-")[0]
            os.replace(m.file, os.path.join(self.path, final_name))
        with open(os.path.join(self.path, "_SUCCESS"), "w") as fh:
            fh.write("")

    def abort(self, messages) -> None:
        for m in messages:
            if m is not None and os.path.exists(m.file):
                os.remove(m.file)


class KVTextStreamWriter(DataSourceStreamWriter):
    """Streaming sink half of the kvtext connector: each micro-batch's
    tasks write tab-joined lines to per-ATTEMPT temp files; commit()
    renames the winning attempts to ``batch-{batchId}-part-{pid}`` —
    deterministic names keyed by (batchId, partitionId), so a REPLAYED
    batch (failure recovery reruns the last uncommitted batch) overwrites
    its own files instead of duplicating them: idempotent ⇒ effectively
    exactly-once, the same contract as the built-in file sinks' manifest.
    The committed batch id is appended to a ``_batches`` manifest for
    readers that want only committed data."""

    def __init__(self, options) -> None:
        path = options.get("path")
        if not path:
            raise ValueError("kvtext requires a path: .start(<directory>)")
        self.path = path
        os.makedirs(path, exist_ok=True)

    def write(self, iterator) -> "KVTextCommit":
        from pyspark import TaskContext

        ctx = TaskContext.get()
        pid = ctx.partitionId()
        tmp = os.path.join(
            self.path, f".part-{pid:05d}.attempt-{ctx.taskAttemptId()}.tmp"
        )
        with open(tmp, "w", encoding="utf-8") as fh:
            for row in iterator:
                fh.write("\t".join("" if v is None else str(v) for v in row))
                fh.write("\n")
        return KVTextCommit(tmp)

    def commit(self, messages, batchId: int) -> None:
        committed: set[str] = set()
        for m in messages:
            if m is None:
                continue
            name = os.path.basename(m.file)
            pid = name[len(".part-"):].split(".attempt-")[0]
            final = f"batch-{batchId:05d}-part-{pid}"
            os.replace(m.file, os.path.join(self.path, final))
            committed.add(final)
        # A batch replayed after a crash between the renames and the
        # engine's checkpoint commit must not double-count: drop sibling
        # part files from the earlier attempt that this commit did not
        # produce (a replay can legitimately plan fewer partitions), and
        # keep the manifest append idempotent. Guard: a degenerate replay
        # that committed NO files (empty/all-None messages) must not sweep
        # away the earlier successful attempt's data — skip the cleanup
        # and leave the prior part files as the batch's content.
        if committed:
            prefix = f"batch-{batchId:05d}-part-"
            for name in os.listdir(self.path):
                if name.startswith(prefix) and name not in committed:
                    os.remove(os.path.join(self.path, name))
        manifest = os.path.join(self.path, "_batches")
        lines: list[str] = []
        if os.path.exists(manifest):
            with open(manifest, encoding="utf-8") as fh:
                lines = [ln for ln in fh.read().splitlines() if ln]
        if str(batchId) not in lines:
            lines.append(str(batchId))
        tmp = manifest + ".tmp"
        with open(tmp, "w", encoding="utf-8") as fh:
            fh.write("".join(f"{ln}\n" for ln in lines))
        os.replace(tmp, manifest)

    def abort(self, messages, batchId: int) -> None:
        for m in messages:
            if m is not None and os.path.exists(m.file):
                os.remove(m.file)
