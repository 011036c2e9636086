"""Incremental rollup: merged daily partials == one direct aggregate,
bit-for-bit (decimal partial sums make the merge order-independent)."""

from __future__ import annotations

from pyspark.sql import functions as F

from simple_etl_pipeline_spark.operators.rollup import (
    daily_partials,
    finalize,
    merge_partials,
)
from simple_etl_pipeline_spark.schemas import load_table


def _rows(df):
    return [tuple(r) for r in df.collect()]


def test_merged_partials_equal_direct(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    direct = finalize(daily_partials(ev))

    # Three disjoint arrival slices (simulated daily ingests).
    slices = [
        ev.filter(F.dayofmonth("ts") <= 10),
        ev.filter((F.dayofmonth("ts") > 10) & (F.dayofmonth("ts") <= 20)),
        ev.filter(F.dayofmonth("ts") > 20),
    ]
    merged = finalize(merge_partials(*[daily_partials(s) for s in slices]))
    assert _rows(merged) == _rows(direct)


def test_merge_is_incremental_and_reorderable(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    a = daily_partials(ev.filter(F.dayofmonth("ts") <= 15))
    b = daily_partials(ev.filter(F.dayofmonth("ts") > 15))
    ab = _rows(finalize(merge_partials(a, b)))
    ba = _rows(finalize(merge_partials(b, a)))
    assert ab == ba
    # merging a merge with nothing new is a fixpoint
    again = _rows(finalize(merge_partials(merge_partials(a, b))))
    assert again == ab
