"""Multimodal queries: binary payload columns with typed metadata.

mm_binary_meta is pure Column algebra; mm_blob_features goes through
the mapInPandas feature extractor (multimodal/features.py) — its byte
statistics are integer-exact, so even the Python-side path is
oracle-checkable in DuckDB (ord() over ASCII == byte values).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from simple_etl_pipeline_spark.multimodal.features import (
    extract_blob_features,
    with_blob_column,
)
from simple_etl_pipeline_spark.schemas import load_table


def mm_binary_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    blobs = with_blob_column(docs)
    return blobs.select(
        "doc_id",
        "mime",
        F.length("blob").alias("size_bytes"),
        F.md5("blob").alias("content_md5"),
    ).orderBy("doc_id")


MM_BINARY_META_ORACLE = """
SELECT doc_id,
  (['image/png', 'audio/wav', 'video/mp4'])[(doc_id % 3) + 1] AS mime,
  octet_length(encode(text)) AS size_bytes,
  md5(text) AS content_md5
FROM documents WHERE text IS NOT NULL ORDER BY doc_id
"""


def mm_blob_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return extract_blob_features(with_blob_column(docs)).orderBy("doc_id")


# Byte iteration via hex(encode(text)) — ord(substr(text, i, 1)) walks
# CODE POINTS, which coincides with bytes only on ASCII; a CJK payload
# diverged (adversarial-corpus finding, round 5). Each byte is the
# hex pair at (2i-1, 2).
MM_BLOB_FEATURES_ORACLE = """
WITH b AS (
  SELECT doc_id, hex(encode(text)) AS hx,
         octet_length(encode(text)) AS sz
  FROM documents WHERE text IS NOT NULL
)
SELECT doc_id,
  (['image/png', 'audio/wav', 'video/mp4'])[(doc_id % 3) + 1] AS mime,
  sz AS size_bytes,
  CASE WHEN sz = 0 THEN 0.0
  ELSE CAST(list_sum(list_transform(generate_series(1, sz),
       i -> CAST(concat('0x', substr(hx, 2*i - 1, 2)) AS INT))) AS DOUBLE)
       / sz
  END AS mean_byte,
  CAST(sz % 640 AS INTEGER) AS width,
  CAST(sz % 480 AS INTEGER) AS height
FROM b ORDER BY doc_id
"""


def mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every 4th 64-byte 'frame' of each video blob as its own row — the
    1->N explode real frame sampling performs, via mapInPandas (no
    shuffle; frame rows inherit input partitioning)."""
    from simple_etl_pipeline_spark.multimodal.features import sample_frames

    docs = load_table(spark, sf_dir, "documents")
    videos = with_blob_column(docs).filter(F.col("mime") == "video/mp4")
    return sample_frames(videos, frame_bytes=64, every=4).orderBy(
        "doc_id", "frame_idx"
    )


# frames are BYTE windows: slice the hex string (2 chars/byte) and
# md5 the unhexed bytes — char-based substr diverges on multi-byte text
MM_FRAME_SAMPLE_ORACLE = """
WITH v AS (
  SELECT doc_id, hex(encode(text)) AS hx,
         octet_length(encode(text)) AS sz
  FROM documents WHERE doc_id % 3 = 2 AND text IS NOT NULL
)
SELECT doc_id, i AS frame_idx,
  md5(substr(hx, i * 128 + 1, 128)) AS frame_md5
FROM v, UNNEST(generate_series(0, sz // 64 - 1)) AS t(i)
WHERE i % 4 = 0
ORDER BY doc_id, frame_idx
"""


def mm_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-neighbor 'resize' of image blobs to 32 samples: sample i
    reads source byte (i*size)//32, exact integer arithmetic in both
    engines, md5-checkable output."""
    from simple_etl_pipeline_spark.multimodal.features import resize_blob

    docs = load_table(spark, sf_dir, "documents")
    images = with_blob_column(docs).filter(F.col("mime") == "image/png")
    return resize_blob(images, target=32).orderBy("doc_id")


# sampled BYTES via hex pairs: byte (i*sz)//32 is the pair at
# 2*((i*sz)//32)+1; md5 runs over the unhexed reconstructed bytes
MM_RESIZE_ORACLE = """
WITH im AS (
  SELECT doc_id, hex(encode(text)) AS hx,
         octet_length(encode(text)) AS sz
  FROM documents
  WHERE doc_id % 3 = 0 AND text IS NOT NULL
    AND octet_length(encode(text)) > 0
),
s AS (
  SELECT doc_id,
    list_transform(generate_series(0, 31),
                   i -> substr(hx, 2 * ((i * sz) // 32) + 1, 2)) AS pairs
  FROM im
)
SELECT doc_id,
  md5(array_to_string(pairs, '')) AS resized_md5,
  CAST(list_sum(list_transform(pairs, p -> CAST(concat('0x', p) AS INT)))
       AS BIGINT) AS resized_sum,
  CAST(list_sum(list_transform(pairs, p -> CAST(concat('0x', p) AS INT)))
       AS DOUBLE) / 32.0 AS resized_mean
FROM s ORDER BY doc_id
"""


QUERIES = {
    "mm_binary_meta": mm_binary_meta,
    "mm_blob_features": mm_blob_features,
    "mm_frame_sample": mm_frame_sample,
    "mm_resize": mm_resize,
}

ORACLES = {
    "mm_binary_meta": MM_BINARY_META_ORACLE,
    "mm_blob_features": MM_BLOB_FEATURES_ORACLE,
    "mm_frame_sample": MM_FRAME_SAMPLE_ORACLE,
    "mm_resize": MM_RESIZE_ORACLE,
}


# --- blob-level dedup (TAIL: no driver-window slot) -----------------------
def mm_dedup_blobs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup of binary payloads by content hash, BEFORE any decode:
    at 100 TB of media the cheapest flop is the one skipped on a
    byte-identical copy (re-crawled images, mirrored videos). One
    groupBy on md5(blob) per mime type; survivors = min doc_id —
    identical shape to the text-side dedup_exact, applied to binary."""
    docs = load_table(spark, sf_dir, "documents")
    blobs = with_blob_column(docs)
    per_hash = blobs.groupBy("mime", F.md5("blob").alias("h")).agg(
        F.count(F.lit(1)).alias("copies"), F.min("doc_id").alias("survivor")
    )
    return (
        per_hash.groupBy("mime")
        .agg(
            F.sum("copies").alias("n_blobs"),
            F.count(F.lit(1)).alias("n_unique"),
            F.sum(F.col("copies") - 1).alias("n_dropped"),
            F.round(
                F.sum(F.col("copies") - 1).cast("double") / F.sum("copies"), 6
            ).alias("dup_rate"),
        )
        .orderBy("mime")
    )


MM_DEDUP_BLOBS_ORACLE = """
WITH b AS (
  SELECT doc_id,
    (['image/png', 'audio/wav', 'video/mp4'])[(doc_id % 3) + 1] AS mime,
    md5(text) AS h
  FROM documents WHERE text IS NOT NULL
), per_hash AS (
  SELECT mime, h, COUNT(*) AS copies, MIN(doc_id) AS survivor
  FROM b GROUP BY mime, h
)
SELECT mime, CAST(SUM(copies) AS BIGINT) AS n_blobs,
  COUNT(*) AS n_unique,
  CAST(SUM(copies - 1) AS BIGINT) AS n_dropped,
  round(CAST(SUM(copies - 1) AS DOUBLE) / SUM(copies), 6) AS dup_rate
FROM per_hash GROUP BY mime ORDER BY mime
"""


# mm_dedup_blobs was DEMOTED to pytest-only parity in round 6
# (tests/test_oracle_parity.py DEMOTED map): as its docstring says, it
# is dedup_exact's hash-groupBy shape applied to the blob column — the
# registered dedup_exact hash pins the dedup semantics and
# mm_binary_meta (driver-green r5) pins the blob plumbing.
TAIL_QUERIES: dict = {}
TAIL_ORACLES: dict = {}
