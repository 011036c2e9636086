"""Incremental aggregate maintenance: algebraic daily partials + merge.

A 100 TB events table cannot re-aggregate from scratch every day. The
standing pattern: each ingested day computes a small PARTIAL aggregate
(sum/count/min/max — the algebraic aggregates, whose partials merge by
re-aggregating), and the serving rollup is the merge of all partials.
Day N's arrival costs one pass over day N only; the merge input is
days × groups rows, not the fact table.

Sums are kept in DECIMAL(38,6) through the partial so the merged result
is bit-identical to a direct full-table aggregate (order-independent
reduction — same device as functions/agg.dsum). Non-algebraic aggregates
(exact countDistinct, medians) do NOT merge this way; at scale those
ride on mergeable sketches instead (HLL / quantile digest), or the exact
variants run as periodic full jobs.

No reference equivalent (the reference re-reads its whole dataset per
run, /root/reference/main.py); this is the §6 scale path.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def daily_partials(events: DataFrame) -> DataFrame:
    """Per (event_date, event_type) partial aggregate of one slice.

    Output schema is the MERGE schema: decimal sum, bigint count,
    double min/max. Any union of outputs of this function (across
    disjoint slices) re-aggregates to the same result as one pass.
    """
    return events.groupBy(
        F.to_date("ts").alias("event_date"), "event_type"
    ).agg(
        F.sum(F.col("value").cast("decimal(38,6)")).alias("sum_value_dec"),
        F.count(F.lit(1)).alias("n_events"),
        F.min("value").alias("min_value"),
        F.max("value").alias("max_value"),
    )


def merge_partials(*partials: DataFrame) -> DataFrame:
    """Merge any number of partial frames into one rollup (re-aggregate
    by the same keys; decimal sums make the result order-independent)."""
    unioned = reduce(lambda a, b: a.unionByName(b), partials)
    return unioned.groupBy("event_date", "event_type").agg(
        F.sum("sum_value_dec").alias("sum_value_dec"),
        F.sum("n_events").alias("n_events"),
        F.min("min_value").alias("min_value"),
        F.max("max_value").alias("max_value"),
    )


def finalize(rollup: DataFrame) -> DataFrame:
    """Presentation form: decimal sums to double, stable ordering."""
    return rollup.select(
        "event_date",
        "event_type",
        F.col("sum_value_dec").cast("double").alias("sum_value"),
        "n_events",
        "min_value",
        "max_value",
    ).orderBy("event_date", "event_type")
