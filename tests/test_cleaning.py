"""Unit spec for the five cleaners — literal cases lifted from the
reference test suite (/root/reference/tests/test_transform.py:25-72,
mirrored in FIXTURES.md §3). These are the de-facto behavioral spec.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from simple_etl_pipeline_spark.functions.cleaning import (
    clean_colors_col,
    clean_gender_col,
    clean_price_col,
    clean_rating_col,
    clean_size_col,
)


def _apply(spark, expr_fn, values, out_type):
    df = spark.createDataFrame(
        [(v,) for v in values], T.StructType([T.StructField("c", T.StringType())])
    )
    rows = df.select(expr_fn("c").cast(out_type).alias("out")).collect()
    return [r.out for r in rows]


PRICE_CASES = [
    ("$99.99", 1599840.0),
    ("100,50", 1608000.0),
    ("1,000.50", 16008000.0),
    ("N/A", None),
    ("", None),
    (None, None),
    ("Invalid", None),
    ("1.2.3", None),  # multi-dot garbage -> float() raises -> None
]

RATING_CASES = [
    ("4.5 / 5", 4.5),
    ("3.2 out of 5", 3.2),
    ("⭐4.5", 4.5),
    ("N/A", None),
    ("", None),
    (None, None),
    ("Invalid", None),
]

COLORS_CASES = [
    ("3 Colors", 3),
    ("2 Colors Available", 2),
    ("Unknown Colors", None),
    ("", None),
    (None, None),
    ("no digits here", None),
]

SIZE_CASES = [
    ("Size: M", "M"),
    ("Size: Large", "Large"),
    ("size:  XL", "XL"),  # case-insensitive prefix
    ("M", "M"),
    ("", None),
    (None, None),
    ("Size: ", None),  # empty after strip
]

GENDER_CASES = [
    ("Gender: Unisex", "Unisex"),
    ("Gender: Male", "Male"),
    ("Women", "Women"),
    ("", None),
    (None, None),
]


@pytest.mark.parametrize(
    "fn,cases,out_type",
    [
        (clean_price_col, PRICE_CASES, "double"),
        (clean_rating_col, RATING_CASES, "double"),
        (clean_colors_col, COLORS_CASES, "long"),
        (clean_size_col, SIZE_CASES, "string"),
        (clean_gender_col, GENDER_CASES, "string"),
    ],
    ids=["price", "rating", "colors", "size", "gender"],
)
def test_cleaner_literals(spark, fn, cases, out_type):
    values = [c[0] for c in cases]
    expected = [c[1] for c in cases]
    got = _apply(spark, fn, values, out_type)
    for v, e, g in zip(values, expected, got):
        if isinstance(e, float):
            assert g == pytest.approx(e), f"input {v!r}"
        else:
            assert g == e, f"input {v!r}"
