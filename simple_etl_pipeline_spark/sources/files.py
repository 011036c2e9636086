"""File sources beyond parquet: schema-explicit CSV and JSON(L) readers.

Always pass an explicit schema: inference costs an extra full scan (at
100 TB, a non-starter) and silently drifts types between runs. Readers
here mirror what load_table does for parquet (schemas.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def read_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    header: bool = True,
    **options,
) -> DataFrame:
    return (
        spark.read.schema(schema)
        .option("header", header)
        .option("mode", "PERMISSIVE")
        .options(**options)
        .csv(path)
    )


def read_json(
    spark: SparkSession, path: str, schema: T.StructType, **options
) -> DataFrame:
    return spark.read.schema(schema).options(**options).json(path)


def write_json(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).json(path)


def write_parquet(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
) -> None:
    """Parquet writer; partition_by turns a column into a directory key —
    the primary pruning lever at 100 TB (e.g. partition events by day)."""
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def read_parquet_evolved(
    spark: SparkSession, path: str, schema: T.StructType, **options
) -> DataFrame:
    """Parquet reader for tables whose schema grew over time.

    A multi-year 100 TB table accretes columns: files written before a
    column existed simply lack it. Passing the CURRENT schema explicitly
    (superset of every historical file) makes old files surface the new
    columns as nulls — no footer-merge job (`mergeSchema`, which reads
    every file's footer up front) and no inference drift. This is the
    evolution policy: additive columns only; renames/retypes are a
    rewrite, not a read-time remap.

    Sharp edge: Spark only descends into `key=value` partition
    directories by default — a root with plain subdirectories silently
    reads ZERO rows. Pass recursiveFileLookup=True for non-partitioned
    nesting (it disables partition discovery, which such layouts don't
    have anyway).
    """
    return spark.read.schema(schema).options(**options).parquet(path)


def read_orc(
    spark: SparkSession, path: str, schema: T.StructType, **options
) -> DataFrame:
    """ORC reader (columnar sibling of parquet; native vectorized scan
    with predicate pushdown, same as parquet). Schema-explicit for the
    same no-footer-inference reason."""
    return spark.read.schema(schema).options(**options).orc(path)


def write_orc(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
) -> None:
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.orc(path)


def read_binary_files(
    spark: SparkSession,
    path: str,
    glob: str | None = None,
    max_bytes: int | None = None,
) -> DataFrame:
    """Raw-blob ingest via Spark's built-in binaryFile source: one row
    per file with (path, modificationTime, length, content binary) —
    the front door of the multimodal pipeline (multimodal/features.py
    consumes exactly this shape after the blobs land in parquet).

    Scale notes: the source parallelizes over files (one task per
    file-split), so millions of small blobs want the directory
    pre-compacted or the read followed by a repartition before heavy
    decode UDFs; `max_bytes` maps to the source's pathGlobFilter-
    independent guard `spark.sql.sources.binaryFile.maxLength` —
    oversized files fail fast instead of OOMing an executor mid-decode.

    SESSION-WIDE CONF: passing `max_bytes` sets
    `spark.sql.sources.binaryFile.maxLength` on the session, and the
    setting STAYS for every later binaryFile read until changed. This
    is deliberate, not an oversight: the returned DataFrame is lazy and
    the source consults the conf at SCAN EXECUTION time, so a
    try/finally restore around `.load()` would silently disable the
    guard before the scan ever runs. Callers that need a different (or
    no) limit afterwards must set/unset the conf themselves once all
    reads taken under the old limit have executed.
    """
    reader = spark.read.format("binaryFile")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    if max_bytes is not None:
        spark.conf.set(
            "spark.sql.sources.binaryFile.maxLength", str(max_bytes)
        )
    return reader.load(path)
