"""The reference's transform pipeline (P7) as one lazy Spark plan.

Reference composition (/root/reference/utils/transform.py:123-174):
copy -> remove_dirty_data (F1) -> five Series.apply cleaners (P1-P5) ->
dropna over {price,rating,colors,size,gender} (F2) -> reset_index.

Here the whole thing is a single narrow (shuffle-free) pipelined stage:
filter + projections + filter, fused by whole-stage codegen. On a
cluster this streams through executors at scan speed regardless of data
volume — no stage-at-a-time materialization like the reference.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from simple_etl_pipeline_spark.functions.cleaning import (
    clean_colors_col,
    clean_gender_col,
    clean_price_col,
    clean_rating_col,
    clean_size_col,
    dirty_row_predicate,
)
from simple_etl_pipeline_spark.schemas import CLEAN_PRODUCT_SCHEMA, CLEAN_SUBSET

REQUIRED_COLUMNS = ["title", "price", "rating", "colors", "size", "gender"]


def remove_dirty_data(df: DataFrame) -> DataFrame:
    """F1: drop rows whose title/rating/price hold dirty sentinels or
    nulls (reference utils/transform.py:108-121). Columns absent from
    the frame are skipped, mirroring the reference's per-column guard.
    """
    present = [c for c in df.columns]
    return df.filter(dirty_row_predicate(columns=present))


def transform_data(df: DataFrame) -> DataFrame:
    """Full clean pipeline; missing required columns -> empty clean frame
    (reference swallows the KeyError and returns empty,
    utils/transform.py:170-174 — here it is an explicit schema check).
    """
    missing = set(REQUIRED_COLUMNS) - set(df.columns)
    if missing:
        return df.sparkSession.createDataFrame([], CLEAN_PRODUCT_SCHEMA)

    cleaned = remove_dirty_data(df).withColumns(
        {
            "price": clean_price_col("price"),
            "rating": clean_rating_col("rating"),
            "colors": clean_colors_col("colors"),
            "size": clean_size_col("size"),
            "gender": clean_gender_col("gender"),
        }
    )
    # F2: any null among the cleaned value columns drops the row
    # (reference utils/transform.py:159-162). reset_index is a no-op —
    # Spark DataFrames have no index.
    return cleaned.na.drop(subset=CLEAN_SUBSET)
