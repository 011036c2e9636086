"""Bucketed tables: pre-shuffled storage for repeat-join workloads.

At 100 TB, lineitem |><| orders on orderkey shuffles both fact tables on
every query. Writing both `bucketBy(N, key).sortBy(key)` pays that
shuffle once at ingest; every subsequent join is exchange-free (verified
in tests/test_bucketing.py: the join plan contains no ShuffleExchange).
Bucket count rule of thumb: total_size / (128-256 MB), same N on both
sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame, table_name: str, bucket_col: str, num_buckets: int = 8
) -> None:
    (
        df.write.format("parquet")
        .bucketBy(num_buckets, bucket_col)
        .sortBy(bucket_col)
        .mode("overwrite")
        .saveAsTable(table_name)
    )


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, left_on: str, right_on: str
) -> DataFrame:
    l, r = spark.table(left_table), spark.table(right_table)
    return l.join(r, l[left_on] == r[right_on])
