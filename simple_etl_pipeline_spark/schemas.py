"""Explicit schemas + table readers.

The reference never declares a schema (pandas-inferred,
/root/reference/utils/extract.py:133); here every table is explicit so
scans prune columns and parquet readers never re-infer. Testdata table
schemas mirror FIXTURES.md §5.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Raw scrape output: 7 string columns (reference utils/extract.py:76-84).
RAW_PRODUCT_SCHEMA = T.StructType(
    [
        T.StructField("title", T.StringType()),
        T.StructField("price", T.StringType()),
        T.StructField("rating", T.StringType()),
        T.StructField("colors", T.StringType()),
        T.StructField("size", T.StringType()),
        T.StructField("gender", T.StringType()),
        T.StructField("timestamp", T.StringType()),
    ]
)

# Post-transform schema (reference utils/transform.py:145-162; golden
# output /root/reference/products.csv). timestamp stays a string for
# bit-compat with the reference.
CLEAN_PRODUCT_SCHEMA = T.StructType(
    [
        T.StructField("title", T.StringType(), nullable=False),
        T.StructField("price", T.DoubleType()),
        T.StructField("rating", T.DoubleType()),
        T.StructField("colors", T.LongType()),
        T.StructField("size", T.StringType()),
        T.StructField("gender", T.StringType()),
        T.StructField("timestamp", T.StringType()),
    ]
)

# Columns whose nulls drop the row post-clean (utils/transform.py:160).
CLEAN_SUBSET = ["price", "rating", "colors", "size", "gender"]

TESTDATA_TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

# Small dimensions that should always be broadcast in joins.
BROADCAST_TABLES = {"region", "nation", "supplier", "part", "customer"}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one testdata parquet table.

    Parquet keeps its embedded schema; Catalyst prunes columns and pushes
    filters into the scan, so callers should select/filter as early as
    possible and let the optimizer do the rest.
    """
    if name not in TESTDATA_TABLES:
        raise ValueError(f"unknown table {name!r}; expected one of {TESTDATA_TABLES}")
    if name == "events":
        # events.parquet uses TIMESTAMP(NANOS), which Spark's reader
        # rejects by default. Runtime-settable, so harness-provided
        # sessions (built without our factory) work too.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    # events.ts is TIMESTAMP(NANOS) in parquet; with nanosAsLong (see
    # session.py) it surfaces as bigint nanos — convert to microsecond
    # timestamps (truncation, consistent with DuckDB's epoch() floor).
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TESTDATA_TABLES}
