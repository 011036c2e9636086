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
FROM documents ORDER BY doc_id
"""


def mm_blob_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return extract_blob_features(with_blob_column(docs)).orderBy("doc_id")


MM_BLOB_FEATURES_ORACLE = """
SELECT doc_id,
  (['image/png', 'audio/wav', 'video/mp4'])[(doc_id % 3) + 1] AS mime,
  octet_length(encode(text)) AS size_bytes,
  CAST(list_sum(list_transform(generate_series(1, length(text)),
       i -> ord(substr(text, i, 1)))) AS DOUBLE) / octet_length(encode(text)) AS mean_byte,
  CAST(octet_length(encode(text)) % 640 AS INTEGER) AS width,
  CAST(octet_length(encode(text)) % 480 AS INTEGER) AS height
FROM documents ORDER BY doc_id
"""


QUERIES = {
    "mm_binary_meta": mm_binary_meta,
    "mm_blob_features": mm_blob_features,
}

ORACLES = {
    "mm_binary_meta": MM_BINARY_META_ORACLE,
    "mm_blob_features": MM_BLOB_FEATURES_ORACLE,
}
