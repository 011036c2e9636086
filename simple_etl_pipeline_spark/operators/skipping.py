"""File-level Bloom-filter data skipping — the point-lookup pruning
layer table formats (Iceberg puffin blobs, Delta bloom indexes, Parquet
column bloom filters) maintain beside min/max stats.

Min/max pruning (operators/partitioning.py, ev_zorder_layout) answers
range predicates; it is useless for a point lookup on a high-cardinality
column whose values are spread across every file (user_id in an
event log: every file's [min, max] spans the whole id space). A per-file
Bloom filter answers `col = value` probes: a file whose filter misses
the value PROVABLY does not contain it and is never opened.

Scale contract:
- The index is METADATA-sized: BLOOM_WORDS 32-bit words per file
  (~0.5 KB), regardless of row count — 100 TB at 256 MB files is
  ~400k files => ~200 MB of index, a driver/catalog-sized table (the
  same class as the partition listing; collecting it is the documented
  metadata exception, like operators/cdc.py's pruned rewrite).
- Index build is ONE scan: rows explode to BLOOM_K (file, bit)
  positions, one groupBy per file bit_or-folds the words map-side.
- False positives only ever cost an extra file read; false negatives
  are impossible (the Bloom contract, asserted by the tests on every
  sampled value).
- Selectivity COMPOSES WITH LAYOUT: on hash-scattered files a frequent
  key appears in most files and the index prunes little for it (it
  still prunes absent/rare keys hard — the contamination-check shape).
  Clustering the write by the probe column (ev_zorder_layout /
  sortWithinPartitions) concentrates each key into few files, which is
  what makes per-file filters selective in production table formats.

The reference has nothing like it (SURVEY.md §2f); the bit layout
mirrors plans/text.txt_bloom_contamination (32-bit words keep every
mask positive in BIGINT arithmetic).
"""

from __future__ import annotations

import re
from urllib.parse import unquote

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from simple_etl_pipeline_spark.functions.text import (
    BLOOM_K,
    BLOOM_WORD_BITS,
    BLOOM_WORDS,
    bloom_positions_col,
    py_bloom_positions,
)


def bloom_word_fold(rows: DataFrame, file_col: str = "file") -> DataFrame:
    """The one-scan word fold shared by the physical per-file index
    (build_bloom_index) and the oracle-checked stats query
    (plans/events.skip_bloom_stats): (file, val) rows -> one row per
    file with n_rows and the non-zero 32-bit words of its 4096-bit
    filter as a sorted map<word_idx, mask>."""
    return (
        rows.select(
            file_col, F.explode(bloom_positions_col("val")).alias("idx")
        )
        .groupBy(file_col, F.expr(f"idx div {BLOOM_WORD_BITS}").alias("word"))
        .agg(
            F.bit_or(
                F.expr(f"shiftleft(1L, CAST(idx % {BLOOM_WORD_BITS} AS INT))")
            ).alias("mask"),
            # per-(file, word) probe count; summed below via a second
            # tiny agg over file
            F.count(F.lit(1)).alias("n_probes"),
        )
        .groupBy(file_col)
        .agg(
            (F.sum("n_probes") / BLOOM_K).cast("bigint").alias("n_rows"),
            F.map_from_entries(
                F.sort_array(F.collect_list(F.struct("word", "mask")))
            ).alias("words"),
        )
    )


def build_bloom_index(
    spark: SparkSession, table_path: str, column: str
) -> DataFrame:
    """One-scan per-file Bloom index over `column`.

    Returns (file, n_rows, words) where words is a map<word_idx, mask>
    holding only the non-zero 32-bit words of each file's 4096-bit
    filter. Hashes are the engine-portable salted md5_hash60 — the same
    primitive every oracle-checked Bloom in the repo uses."""
    # NULLs can never match a `col = value` probe and a NULL hash would
    # poison the words map (NULL_MAP_KEY) — drop them before hashing
    rows = (
        spark.read.parquet(table_path)
        .filter(F.col(column).isNotNull())
        .select(
            F.input_file_name().alias("file"),
            F.col(column).cast("string").alias("val"),
        )
    )
    return bloom_word_fold(rows)


def engine_rendering(spark: SparkSession, value, dtype) -> str:
    """Render `value` exactly as the index build did: Spark's own
    cast(column AS string) after casting to the column's type. Python's
    str() agrees with it only for int/string columns (booleans render
    'True' vs 'true', floats/decimals/timestamps have their own
    formats) — a mismatch would be a silent FALSE NEGATIVE, so probes
    for any other type must go through this 1-row jvm round-trip."""
    row = (
        spark.range(1)
        .select(F.lit(value).cast(dtype).cast("string").alias("v"))
        .first()
    )
    return row["v"]


def prune_files(index_rows, value) -> list[str]:
    """Files whose filter MAY contain value (collected index rows —
    metadata-sized, see module docstring). Deterministic order.

    `value` must already be rendered the way the index build rendered
    it — Spark's cast-to-string. Plain int/str values render
    identically under Python's str() (the only types the direct call
    supports); for anything else pass engine_rendering(...) output, as
    read_with_bloom does."""
    positions = py_bloom_positions(str(value))
    keep = []
    for r in index_rows:
        words = r["words"] or {}
        hit = all(
            (words.get(p // BLOOM_WORD_BITS, 0) >> (p % BLOOM_WORD_BITS)) & 1
            for p in positions
        )
        if hit:
            keep.append(r["file"])
    return sorted(keep)


def _decode_file_uri(file: str) -> str:
    """input_file_name() emits URI-encoded paths (space -> %20) that
    spark.read.parquet would then glob-interpret: unquote the escapes
    and bracket-escape glob metacharacters so the path round-trips
    byte-exact back into the reader."""
    decoded = unquote(file)
    return re.sub(r"([*?{}\[\]])", r"[\1]", decoded)


def read_with_bloom(
    spark: SparkSession,
    table_path: str,
    column: str,
    value,
    index_rows,
) -> DataFrame:
    """Point lookup through the index: open only the may-contain files,
    then apply the exact predicate (Bloom hits can be false positives —
    the residual filter is mandatory, same as any skipping index).
    No candidate files -> empty frame with the table's schema.

    The schema probe is a directory listing + ONE footer read — needed
    to render the probe value with Spark's own cast-to-string (see
    engine_rendering); a production catalog would serve the schema
    without the listing."""
    schema = spark.read.parquet(table_path).schema
    dtype = schema[column].dataType
    files = prune_files(index_rows, engine_rendering(spark, value, dtype))
    if not files:
        return spark.createDataFrame([], schema)
    return spark.read.parquet(*[_decode_file_uri(f) for f in files]).filter(
        F.col(column) == F.lit(value).cast(dtype)
    )
