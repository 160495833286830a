"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Design (the part that matters at 100 TB):
  - media is an opaque ``binary`` column with a typed metadata struct
    (media_type, n_bytes, checksum) riding alongside — never parsed by
    Catalyst, so scans prune it unless a stage actually needs the bytes;
  - all byte-touching work happens in Arrow-batched pandas iterators
    (``mapInPandas``) — one Python worker per partition, zero per-row
    overhead, bounded memory via spark.sql.execution.arrow.maxRecordsPerBatch;
  - decode is a pluggable step. The real decoders (PIL/torchaudio/ffmpeg)
    aren't in this container, so `decode_media` raises NotImplementedError
    unless the deterministic fake decoder is requested; everything around
    it — schema, batching, partitioning, UDF signatures — is real and
    tested.

The reference engine has no binary/multimodal support at all (strings-only
data model, SURVEY.md §1); this is a north-star extension.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..tables import load_table

FEATURE_DIM = 16

MEDIA_SCHEMA = (
    "doc_id bigint, media binary, media_type string, n_bytes bigint, "
    "checksum bigint"
)

FEATURES_SCHEMA = "doc_id bigint, media_type string, features array<double>"

COUNTS_SCHEMA = (
    "doc_id bigint, media_type string, n_bytes bigint, counts array<bigint>"
)


def synthesize_media(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build a media table from documents: UTF-8 bytes as the opaque payload
    (a deterministic stand-in for image/audio bytes) + typed metadata.
    crc32 works as the checksum because it's also computable JVM-side."""
    docs = load_table(spark, sf_dir, "documents")
    media = F.encode(F.col("text"), "UTF-8")
    return docs.select(
        "doc_id",
        media.alias("media"),
        F.when(F.col("doc_id") % 3 == 0, "image/png")
        .when(F.col("doc_id") % 3 == 1, "audio/wav")
        .otherwise("video/mp4")
        .alias("media_type"),
        F.octet_length(media).cast("long").alias("n_bytes"),
        F.crc32(media).alias("checksum"),
    )


def decode_media(payload: bytes, media_type: str, use_fake: bool = False):
    """Decode a media payload. Real decoders (PIL, torchaudio, ffmpeg) are
    not available in this environment — STUB: raises unless the
    deterministic fake decoder is requested (use_fake=True), which returns
    the raw bytes for feature extraction."""
    if not use_fake:
        raise NotImplementedError(
            "real media decoding requires PIL/torchaudio/ffmpeg; "
            "pass use_fake=True for the deterministic byte-level fake"
        )
    return payload


def extract_feature_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The pandas stage of feature extraction: Arrow batches of binary
    payloads in, one row per item out with an integer 16-bin high-nibble
    byte histogram (``counts``). Integer counts are the canonical output —
    exactly reproducible by a SQL oracle and safe to hash — and every
    float view (normalized features) derives from them JVM-side."""
    media = synthesize_media(spark, sf_dir)

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in it:
            counts = []
            for payload, mtype in zip(pdf["media"], pdf["media_type"]):
                raw = decode_media(bytes(payload), mtype, use_fake=True)
                arr = np.frombuffer(raw, dtype=np.uint8)
                counts.append(
                    np.bincount(arr >> 4, minlength=FEATURE_DIM).tolist()
                )
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": pdf["n_bytes"],
                    "counts": counts,
                }
            )

    return media.mapInPandas(batches, schema=COUNTS_SCHEMA)


def extract_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width normalized feature vectors (the embedding-model output
    shape): derives `features array<double>` from the integer histogram
    JVM-side (`F.transform`), keeping the only Python stage the Arrow
    histogram pass in :func:`extract_feature_counts`."""
    counts = extract_feature_counts(spark, sf_dir)
    return counts.select(
        "doc_id",
        "media_type",
        F.transform(
            "counts",
            lambda c: F.when(
                F.col("n_bytes") > 0, c / F.col("n_bytes")
            ).otherwise(F.lit(0.0)),
        ).alias("features"),
    )


def media_feature_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-facing exploded view of the feature histogram: one row per
    (doc, bin) with the integer count and normalized weight. Scalar
    columns only — hash-friendly for the correctness gate — and the
    explode happens JVM-side (posexplode) so each item crosses the Arrow
    boundary once, not 16 times."""
    counts = extract_feature_counts(spark, sf_dir)
    return counts.select(
        "doc_id",
        "media_type",
        "n_bytes",
        F.posexplode("counts").alias("bin", "bin_count"),
    ).select(
        "doc_id",
        "media_type",
        "bin",
        "bin_count",
        F.when(F.col("n_bytes") > 0, F.col("bin_count") / F.col("n_bytes"))
        .otherwise(F.lit(0.0))
        .alias("weight"),
    )


# Exact oracle: the high nibble of byte k is hex digit 2k of hex(payload),
# so the histogram is a GROUP BY over the odd-position characters of the
# hex encoding — pure integer arithmetic, reproduced bit-for-bit.
MEDIA_FEATURE_BINS_SQL = f"""
WITH base AS (
  SELECT doc_id,
         CASE WHEN doc_id % 3 = 0 THEN 'image/png'
              WHEN doc_id % 3 = 1 THEN 'audio/wav'
              ELSE 'video/mp4' END AS media_type,
         upper(hex(encode(text))) AS h,
         octet_length(encode(text)) AS n
  FROM documents
),
ks AS (
  SELECT unnest(generate_series(0, (SELECT COALESCE(max(n), 1) - 1 FROM base))) AS k
),
nib AS (
  SELECT doc_id,
         strpos('0123456789ABCDEF', substring(h, 2 * k + 1, 1)) - 1 AS bin
  FROM base, ks
  WHERE k < n
),
cnt AS (
  SELECT doc_id, bin, count(*) AS bin_count FROM nib GROUP BY doc_id, bin
),
bins AS (SELECT unnest(generate_series(0, {FEATURE_DIM - 1})) AS bin)
SELECT b.doc_id,
       b.media_type,
       CAST(bins.bin AS INTEGER) AS bin,
       CAST(COALESCE(c.bin_count, 0) AS BIGINT) AS bin_count,
       CASE WHEN b.n = 0 THEN 0.0
            ELSE COALESCE(c.bin_count, 0) / CAST(b.n AS DOUBLE)
       END AS weight
FROM base b
CROSS JOIN bins
LEFT JOIN cnt c ON c.doc_id = b.doc_id AND c.bin = bins.bin
"""


def media_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata-only scan: checksum/size stats per media type. The binary
    column is pruned from the scan entirely (metadata rides in separate
    columns) — the plan to check when validating 100 TB behavior."""
    media = synthesize_media(spark, sf_dir)
    return (
        media.groupBy("media_type")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum("n_bytes").alias("total_bytes"),
        )
        .orderBy("media_type")
    )


RESIZE_SCHEMA = (
    "doc_id bigint, media_type string, n_bytes bigint, resized_bytes bigint"
)

FRAMES_SCHEMA = "doc_id bigint, frame_id int, frame_bytes bigint"

N_FRAMES = 4


def resize_media(spark: SparkSession, sf_dir: str) -> DataFrame:
    """'Resize' every media payload by stride-2 byte sampling (the
    deterministic stand-in for an image downscale — same mapInPandas
    plumbing: bytes in, smaller bytes out, metadata updated). The output
    reports original and resized sizes; the size arithmetic
    ((n+1)//2) is what the oracle checks — the pandas stage really slices
    the payload, the oracle shortcuts to the arithmetic."""
    media = synthesize_media(spark, sf_dir)

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            resized = [bytes(p)[::2] for p in pdf["media"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": pdf["n_bytes"],
                    "resized_bytes": [len(r) for r in resized],
                }
            )

    return media.mapInPandas(batches, schema=RESIZE_SCHEMA)


RESIZE_MEDIA_SQL = """
SELECT doc_id,
  CASE WHEN doc_id % 3 = 0 THEN 'image/png'
       WHEN doc_id % 3 = 1 THEN 'audio/wav'
       ELSE 'video/mp4' END AS media_type,
  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
  CAST((octet_length(encode(text)) + 1) // 2 AS BIGINT) AS resized_bytes
FROM documents
"""


def frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling for video payloads: split each video into up to
    N_FRAMES contiguous chunks (stride = ceil(n/4)), one output row per
    frame — the 1→N row shape of a video decoder, via mapInPandas. Frame
    boundaries are pure integer arithmetic so the oracle reproduces the
    row multiplication and every frame size exactly; the pandas stage
    actually materializes each chunk."""
    media = synthesize_media(spark, sf_dir).where(
        F.col("media_type") == "video/mp4"
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {"doc_id": [], "frame_id": [], "frame_bytes": []}
            for doc_id, payload in zip(pdf["doc_id"], pdf["media"]):
                raw = bytes(payload)
                n = len(raw)
                stride = -(-n // N_FRAMES) if n else 0
                for k in range(N_FRAMES):
                    start = k * stride
                    if n == 0 or start >= n:
                        break
                    chunk = raw[start : start + stride]
                    out["doc_id"].append(doc_id)
                    out["frame_id"].append(k)
                    out["frame_bytes"].append(len(chunk))
            yield pd.DataFrame(out)

    return media.mapInPandas(batches, schema=FRAMES_SCHEMA)


FRAME_SAMPLE_SQL = f"""
WITH vids AS (
  SELECT doc_id, octet_length(encode(text)) AS n
  FROM documents WHERE doc_id % 3 = 2
),
strides AS (
  SELECT doc_id, n, CAST(ceil(n / {N_FRAMES}.0) AS BIGINT) AS stride
  FROM vids WHERE n > 0
)
SELECT doc_id, CAST(k AS INTEGER) AS frame_id,
       least(stride, n - k * stride) AS frame_bytes
FROM strides, (SELECT unnest(generate_series(0, {N_FRAMES - 1})) AS k) ks
WHERE k * stride < n
"""


def media_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup over the BINARY payload: canonical assignment by md5 of
    the media bytes — the multimodal twin of dedup_exact (which fingerprints
    text). md5 over bytes is the right key for opaque media: identical
    payloads collide regardless of metadata, and the 16-byte key is what
    shuffles, never the blob (the scan prunes `media` down to the hash
    immediately; the window moves doc_id + fp only). Echoes the reference's
    own md5-keyed routing (reference worker/__main__.py:62-65), applied to
    content identity instead of shuffle placement.

    Oracle: DuckDB md5(text) hashes the same UTF-8 bytes the synthesized
    payload holds, so the hex keys agree exactly.
    """
    from pyspark.sql.window import Window

    media = synthesize_media(spark, sf_dir)
    w = Window.partitionBy("fp")
    return (
        media.select(
            "doc_id", "media_type", F.md5(F.col("media")).alias("fp")
        )
        .select(
            "doc_id",
            "media_type",
            F.min("doc_id").over(w).alias("canonical_id"),
            F.count(F.lit(1)).over(w).alias("group_size"),
        )
    )


MEDIA_DEDUP_SQL = """
WITH fps AS (
  SELECT doc_id,
         CASE WHEN doc_id % 3 = 0 THEN 'image/png'
              WHEN doc_id % 3 = 1 THEN 'audio/wav'
              ELSE 'video/mp4' END AS media_type,
         md5(text) AS fp
  FROM documents
)
SELECT doc_id, media_type,
       min(doc_id) OVER (PARTITION BY fp) AS canonical_id,
       count(*) OVER (PARTITION BY fp) AS group_size
FROM fps
"""
