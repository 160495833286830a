"""Reusable column expressions: cross-engine hashing, text statistics,
vector math. Pure `pyspark.sql.functions` compositions — JVM-side,
whole-stage-codegen friendly; no Python UDFs in this package."""
