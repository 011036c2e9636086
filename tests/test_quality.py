"""Constraint checks: one aggregate pass, correct violation counts; the
Observation variant rides the caller's own action (no extra job)."""

from __future__ import annotations

from simple_etl_pipeline_spark.operators.quality import (
    check_constraints,
    in_range,
    in_set,
    not_null,
    observe_quality,
    unique,
)
from simple_etl_pipeline_spark.schemas import load_table


def test_constraints_on_clean_table(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    out = check_constraints(
        orders,
        [
            not_null("o_orderkey"),
            unique("o_orderkey"),
            in_range("o_totalprice", 0, 1e9),
        ],
    )
    rows = {r.check: (r.n_violations, r.passed) for r in out.collect()}
    assert rows == {
        "o_orderkey_not_null": (0, True),
        "o_orderkey_unique": (0, True),
        "o_totalprice_in_range": (0, True),
    }


def test_constraints_count_violations(spark):
    df = spark.createDataFrame(
        [(1, "a", 5.0), (1, "b", -3.0), (None, "zz", 7.0)],
        "k int, tag string, v double",
    )
    out = check_constraints(
        df,
        [
            not_null("k"),
            unique("k"),
            in_range("v", 0, 10),
            in_set("tag", ["a", "b"]),
        ],
    )
    rows = {r.check: r.n_violations for r in out.collect()}
    assert rows == {
        "k_not_null": 1,
        "k_unique": 1,  # two rows share k=1; the single NULL adds none
        "v_in_range": 1,
        "tag_in_set": 1,
    }


def test_unique_counts_null_duplicates(spark):
    # count(col)/countDistinct skip NULLs, so many NULL key rows used to
    # pass unique(); they are duplicate keys in practice.
    df = spark.createDataFrame(
        [(None,), (None,), (None,), (7,)], "k int"
    )
    rows = {r.check: r.n_violations for r in check_constraints(df, [unique("k")]).collect()}
    assert rows == {"k_unique": 2}  # 4 rows, distinct {7, NULL-as-one}


def test_unique_on_empty_input_is_zero(spark):
    df = spark.createDataFrame([], "k int")
    rows = {r.check: r.n_violations for r in check_constraints(df, [unique("k")]).collect()}
    assert rows == {"k_unique": 0}


def test_constraints_single_scan(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    out = check_constraints(orders, [not_null("o_orderkey"), unique("o_orderkey")])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan parquet") == 1


def test_observation_rides_existing_action(spark):
    df = spark.createDataFrame([(1,), (None,), (3,)], "k int")
    observed, obs = observe_quality(df, "q", [not_null("k")])
    n = observed.count()  # the caller's own action populates the metrics
    assert n == 3
    got = obs.get
    assert got["n_rows"] == 3 and got["k_not_null"] == 1
