"""The streaming-executable contract — the reference engine's UDF surface.

The reference's core capability is running *arbitrary executables* as
mappers and reducers over tab-separated key/value lines (Hadoop Streaming
contract): the worker pipes input-file lines to the mapper's stdin
(reference worker/__main__.py:173-186), hash-partitions output lines by the
text before the first tab (md5-mod, :62-65,180-186), sorts each partition
(coreutils sort, :191-198), k-way merges sorted runs into the reducer's
stdin (heapq.merge, :241-249), and a contiguous-key group is the reducer's
unit of work.

Spark-first re-expression (SURVEY.md §7 step 3):
  pipe_map     RDD.pipe(cmd) per partition — one external process per
               partition instead of per file (strictly fewer spawns than
               the reference's Popen-per-input-file).
  pipe_reduce  md5-mod key partitioning + sort-within-partition, then
               RDD.pipe(cmd) — the reducer executable sees exactly the
               reference's contract: its partition's lines, sorted
               lexicographically by byte, contiguous groups per key.

Semantics notes:
  - md5-mod partitioning reproduces the reference's *placement* function.
    Query results never depend on it (any partitioning works); it exists so
    executables that assume reference file-assignment behave identically.
  - Sorting is byte-lexicographic on the whole line (LC_ALL=C `sort`
    semantics) — matches the reference's subprocess sort on UTF-8 text.
  - This is the engine's slow path: per-row Python→process→Python. Use
    DataFrame expressions or pandas UDFs when the logic is known; pipe()
    exists for binary compatibility with user executables.

At scale: pipe stages are narrow (map) or single-shuffle (reduce), so they
scale like any Spark job; the external process is the throughput ceiling.
"""

from __future__ import annotations

import hashlib
import os

from pyspark.sql import DataFrame, Row, SparkSession
from pyspark.sql import functions as F


def _md5_mod(key: str, num_partitions: int) -> int:
    """The reference's placement hash: md5 of the key text, mod partitions
    (reference worker/__main__.py:62-65). Used only for executable-visible
    partition assignment — never for query semantics."""
    return int(hashlib.md5(key.encode("utf-8")).hexdigest(), 16) % num_partitions


def pipe_map(df: DataFrame, command: str) -> DataFrame:
    """Run an executable as a flatMap over lines (mapper contract).

    ``df`` must have a single string column (the line). Each partition's
    lines stream through one process instance; 0..n output lines per input
    line. Output schema: key/value split on the first tab.
    """
    (col,) = df.columns
    spark = df.sparkSession
    lines = df.rdd.map(lambda r: r[0] if r[0] is not None else "")
    piped = lines.pipe(command)
    kv = piped.map(lambda line: Row(*_split_kv(line)))
    return spark.createDataFrame(kv, "key string, value string")


def pipe_reduce_lines(df: DataFrame, command: str, num_partitions: int):
    """Reducer contract, returning the raw output-line RDD with the
    reference's partition placement intact: partition ``i`` of the returned
    RDD holds exactly what reducer ``i`` printed, in print order.

    Use this when the *placement* is part of the contract (submit_job's
    part files); use :func:`pipe_reduce` when only the rows matter.
    """
    kv = df.select(
        F.col(df.columns[0]).cast("string").alias("key"),
        F.col(df.columns[1]).cast("string").alias("value"),
    )
    pairs = kv.rdd.map(lambda r: ((r.key, r.value), None))
    # repartitionAndSortWithinPartitions = the reference's partition-then-
    # coreutils-sort, with Spark's spill-aware ExternalSorter instead of an
    # in-memory sort. Sort key = the full `key\tvalue` line bytes (C locale).
    parted = pairs.repartitionAndSortWithinPartitions(
        numPartitions=num_partitions,
        partitionFunc=lambda kv_key: _md5_mod(kv_key[0], num_partitions),
        ascending=True,
        keyfunc=lambda kv_key: f"{kv_key[0]}\t{kv_key[1]}",
    )
    sorted_lines = parted.map(lambda pair: f"{pair[0][0]}\t{pair[0][1]}")
    return sorted_lines.pipe(command)


def pipe_reduce(df: DataFrame, command: str, num_partitions: int) -> DataFrame:
    """Run an executable over sorted, key-partitioned lines (reducer
    contract): md5-mod partition on key → byte-sort within partition →
    one process per partition consuming `key\\tvalue` lines with contiguous
    key groups.
    """
    spark = df.sparkSession
    piped = pipe_reduce_lines(df, command, num_partitions)
    out = piped.map(lambda line: Row(*_split_kv(line)))
    return spark.createDataFrame(out, "key string, value string")


def pipe_word_count(
    spark: SparkSession,
    sf_dir: str,
    mapper: str | None = None,
    reducer: str | None = None,
    num_partitions: int = 4,
) -> DataFrame:
    """Word count executed entirely through external executables — the
    reference's flagship job shape, on our engine's pipe operator.

    Default mapper/reducer are coreutils one-liners with the same semantics
    as the engine-native word_count plan (lowercase, whitespace split, drop
    empties), so the DuckDB wordcount oracle applies.
    """
    # mapper: line → one lowercased `word\t1` per whitespace token
    mapper = mapper or (
        "awk '{ line = tolower($0); n = split(line, w, /[ \\t]+/); "
        'for (i = 1; i <= n; i++) if (w[i] != "") print w[i] "\\t1" }\''
    )
    # reducer: sorted `word\t1` lines → `word\tcount` per contiguous group
    reducer = reducer or (
        "awk -F'\\t' '{ if ($1 != prev) { if (NR > 1) print prev \"\\t\" cnt; "
        "prev = $1; cnt = 0 } cnt += $2 } END { if (NR > 0) print prev \"\\t\" cnt }'"
    )
    from ..tables import load_table

    docs = load_table(spark, sf_dir, "documents").select("text")
    mapped = pipe_map(docs, mapper)
    reduced = pipe_reduce(mapped, reducer, num_partitions)
    return reduced.select(
        F.col("key").alias("word"), F.col("value").cast("long").alias("cnt")
    )


def pipe_grep(
    spark: SparkSession,
    sf_dir: str,
    query: str = "spark",
    num_partitions: int = 1,
) -> DataFrame:
    """Grep executed through external executables, honoring the reference's
    argv contract: the search term reaches the mapper as a command-line
    argument (reference grep_map.py:14-17 reads `sys.argv[1]`), not baked
    into the program text.

    Job shape is the reference's grep exactly: mapper emits `1\\tline` for
    case-insensitive matches (grep_map.py:27), the constant key collapses
    everything onto one reducer, and the reducer passes values through
    (grep_reduce.py:27 prints the value) — here the pass-through is `cat`
    plus the post-pipe value projection.
    """
    import shlex

    from ..tables import load_table

    mapper = (
        "awk -v q=%s '{ line = tolower($0); "
        'if (index(line, q) > 0) print "1\\t" $0 }\'' % shlex.quote(query.lower())
    )
    docs = load_table(spark, sf_dir, "documents").select("text")
    mapped = pipe_map(docs, mapper)
    reduced = pipe_reduce(mapped, "cat", num_partitions)
    return reduced.select(F.col("value").alias("text"))


def _split_kv(line: str) -> tuple[str, str]:
    key, _, value = line.partition("\t")
    return key, value


def submit_job(
    spark,
    input_directory: str,
    output_directory: str,
    mapper: str,
    reducer: str,
    num_mappers: int = 4,
    num_reducers: int = 4,
) -> None:
    """The reference's whole job contract in one call (submit.py:18-60
    flag semantics): text-dir scan with an ``num_mappers`` split floor,
    executable map, md5-mod partition + byte-sort, executable reduce,
    ``num_reducers`` tab-separated part files into a fresh output
    directory. tools/mr_submit.py is the CLI wrapper; golden byte-parity
    with the reference's shipped outputs is asserted in
    tests/test_reference_goldens.py.

    File-placement contract: ``part-0000i`` holds VERBATIM what reducer
    ``i`` (the md5-mod partition, worker/__main__.py:62-65) printed, in
    print order — byte-identical to the reference's part files, not merely
    content-equal. The output RDD's partitions are written directly
    (saveAsTextFile, one task per reducer partition); no repartition sits
    between the reducer and the sink. Empty reducer partitions still
    produce their (empty) part file, matching the reference.
    """
    from ..sources.text_dir import read_text_dir

    lines = read_text_dir(spark, input_directory, min_partitions=num_mappers)
    mapped = pipe_map(lines, mapper)
    out_lines = pipe_reduce_lines(mapped, reducer, num_reducers)
    # The reference manager rmtree+recreates the output dir per job
    # (manager/__main__.py:344-355); the Hadoop FS delete is the
    # cluster-correct equivalent (works for file://, hdfs://, s3a://).
    jvm = spark.sparkContext._jvm
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    jpath = jvm.org.apache.hadoop.fs.Path(output_directory)
    fs = jpath.getFileSystem(hconf)
    if fs.exists(jpath):
        fs.delete(jpath, True)
    # The reference job directory contains ONLY part files; suppress the
    # committer's _SUCCESS marker (all filesystems) so a directory-level
    # diff against reference output matches too.  The Hadoop configuration
    # is SESSION-GLOBAL, so the prior value is restored afterwards —
    # otherwise every later write in the SparkSession (parquet staging,
    # other sinks) would silently lose its _SUCCESS marker too.
    mark_key = "mapreduce.fileoutputcommitter.marksuccessfuljobs"
    prior_mark = hconf.get(mark_key)
    hconf.set(mark_key, "false")
    try:
        out_lines.saveAsTextFile(output_directory)
    finally:
        if prior_mark is None:
            hconf.unset(mark_key)
        else:
            hconf.set(mark_key, prior_mark)
    # Local-FS only: ChecksumFileSystem materializes hidden .crc siblings
    # (and hides them from listStatus, so they must be swept via the OS).
    # Object stores / HDFS keep checksums out of the directory listing.
    local = output_directory
    if local.startswith("file://"):
        local = local[len("file://"):]
    elif local.startswith("file:"):
        local = local[len("file:"):]
    if not local.startswith(("hdfs:", "s3", "abfs", "gs:")) and os.path.isdir(local):
        for name in os.listdir(local):
            if name == "_SUCCESS" or name.endswith(".crc"):
                os.remove(os.path.join(local, name))
