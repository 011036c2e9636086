"""Property-based cleaning tests (hypothesis): for ARBITRARY strings —
not just the curated adversarial corpus in test_cleaning_differential —
the Spark Column cleaners must agree with the Python spec derived from
the reference semantics (SURVEY.md §2c, /root/reference/utils/
transform.py:27-106).

Each hypothesis example is a LIST of strings evaluated in one Spark
job, so the suite stays a few dozen jobs, not thousands. Strategies
bias toward the risk register in SURVEY.md §7: digit/comma/dot soup
for the price comma-heuristic (multi-dot strings, comma-as-decimal vs
thousands separators), unicode around numbers for rating extraction,
and prefix-casing soup for size.
"""

from __future__ import annotations

import math

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import types as T

from simple_etl_pipeline_spark.functions.cleaning import (
    clean_colors_col,
    clean_price_col,
    clean_rating_col,
    clean_size_col,
)
from tests.test_cleaning_differential import (
    clean_colors_py,
    clean_price_py,
    clean_rating_py,
    clean_size_py,
)

# fully arbitrary unicode — this is what found the \t and \x1f
# whitespace-strip divergences (Python isspace() vs Spark trim/\s)
soup_any = st.text(min_size=0, max_size=12)

# digit/comma/dot soup with occasional currency noise — the exact shape
# the price comma-heuristic has to disambiguate
price_soup = st.one_of(
    st.text(alphabet="0123456789.,$€ ABy", min_size=0, max_size=16),
    soup_any,
)
rating_soup = st.one_of(
    st.text(alphabet="0123456789. /⭐★of", min_size=0, max_size=16),
    soup_any,
)
colors_soup = st.one_of(
    st.text(alphabet="0123456789 ColorsUnknown", min_size=0, max_size=20),
    soup_any,
)
size_soup = st.one_of(
    st.text(alphabet="SsIiZzEe: MLXxl\t", min_size=0, max_size=14),
    soup_any,
)

_SETTINGS = settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _run_column(spark, values, col_fn, out_type):
    df = spark.createDataFrame(
        [(v,) for v in values],
        T.StructType([T.StructField("raw", T.StringType())]),
    )
    return [r[0] for r in df.select(col_fn("raw").cast(out_type)).collect()]


def _agree(spark_val, py_val) -> bool:
    if spark_val is None or py_val is None:
        return spark_val is None and py_val is None
    if isinstance(py_val, float):
        if math.isinf(py_val) or math.isnan(py_val):
            # float('1'*20) overflows differ per engine; out of scope
            return True
        return math.isclose(spark_val, py_val, rel_tol=1e-9)
    return spark_val == py_val


@_SETTINGS
@given(st.lists(price_soup, min_size=1, max_size=40))
def test_price_matches_spec(spark, values):
    got = _run_column(spark, values, clean_price_col, "double")
    for v, g in zip(values, got):
        assert _agree(g, clean_price_py(v)), (v, g, clean_price_py(v))


@_SETTINGS
@given(st.lists(rating_soup, min_size=1, max_size=40))
def test_rating_matches_spec(spark, values):
    got = _run_column(spark, values, clean_rating_col, "double")
    for v, g in zip(values, got):
        assert _agree(g, clean_rating_py(v)), (v, g, clean_rating_py(v))


@_SETTINGS
@given(st.lists(colors_soup, min_size=1, max_size=40))
def test_colors_matches_spec(spark, values):
    got = _run_column(spark, values, clean_colors_col, "long")
    for v, g in zip(values, got):
        assert _agree(g, clean_colors_py(v)), (v, g, clean_colors_py(v))


@_SETTINGS
@given(st.lists(size_soup, min_size=1, max_size=40))
def test_size_matches_spec(spark, values):
    got = _run_column(spark, values, clean_size_col, "string")
    for v, g in zip(values, got):
        assert _agree(g, clean_size_py(v)), (v, g, clean_size_py(v))
