"""mapreduce_simulation_spark — a PySpark-native analytics engine.

A brand-new engine with the query/data-processing capabilities of the
reference MapReduce simulation (HaolingPu/MapReduce-Simulation), re-expressed
Spark-first: DataFrame/SQL logical plans optimized by Catalyst, shuffle and
fault tolerance delegated to Spark's DAGScheduler, plus the LLM-data-pipeline
operators (dedup, similarity search, text analysis, multimodal plumbing) that
a 100 TB training-data pipeline needs.

Layout:
    session      SparkSession factory with scale-oriented defaults
    tables       star-schema table loaders (TESTDATA.md parquet)
    sources      text-directory scan / part-file sinks (reference S1-S6)
    operators    pipe (executable contract), dedup, similarity, text, multimodal
    functions    reusable column expressions (vector math, hashing, text stats)
    plans        query registry: reference-parity + relational + pipeline queries
    streaming    Structured Streaming variants of the event queries
"""

__version__ = "0.1.0"
