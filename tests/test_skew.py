"""salted_join: result-identical to the plain join, hot keys spread.

The salted plan must be a drop-in replacement — same rows, same schema —
for inner and left joins, including null-padding of unmatched left rows.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from simple_etl_pipeline_spark.operators.skew import salted_join
from simple_etl_pipeline_spark.schemas import load_table


def _sorted_rows(df):
    cols = sorted(df.columns)
    return sorted(
        tuple(r[c] for c in cols) for r in df.select(*cols).collect()
    )


def test_salted_join_matches_plain_inner(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    customer = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_nationkey"
    ).withColumnRenamed("c_custkey", "o_custkey")
    plain = orders.join(customer, ["o_custkey"], "inner")
    salted = salted_join(orders, customer, ["o_custkey"], salt_buckets=8)
    assert sorted(salted.columns) == sorted(plain.columns)
    assert _sorted_rows(salted) == _sorted_rows(plain)


def test_salted_join_matches_plain_left(spark):
    # Hot key 1 holds 80% of the big side; key 99 has no match at all.
    big = spark.createDataFrame(
        [(1, i) for i in range(80)]
        + [(2, i) for i in range(15)]
        + [(99, i) for i in range(5)],
        "k int, payload int",
    )
    small = spark.createDataFrame([(1, "a"), (2, "b"), (3, "c")], "k int, tag string")
    plain = big.join(small, ["k"], "left")
    salted = salted_join(big, small, ["k"], salt_buckets=4, how="left")
    assert _sorted_rows(salted) == _sorted_rows(plain)
    # Unmatched key 99 survives exactly once per payload with null tag.
    assert salted.filter("k = 99 AND tag IS NULL").count() == 5


def test_salted_join_rejects_outer(spark):
    df = spark.range(1).withColumnRenamed("id", "k")
    with pytest.raises(ValueError, match="inner/left"):
        salted_join(df, df, ["k"], how="full")


def test_salted_join_spreads_hot_key(spark):
    big = spark.createDataFrame([(1, i) for i in range(1000)], "k int, payload int")
    small = spark.createDataFrame([(1, "hot")], "k string, tag string").select(
        F.col("k").cast("int").alias("k"), "tag"
    )
    out = salted_join(big, small, ["k"], salt_buckets=8)
    assert out.count() == 1000
    # The salt column is internal — it must not leak into the result.
    assert "__salt" not in out.columns
