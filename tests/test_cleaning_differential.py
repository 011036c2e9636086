"""Differential test: the Spark Column cleaners vs a direct Python
implementation of the reference's documented semantics
(/root/reference/utils/transform.py:27-106, re-derived from SURVEY.md
§2c — not copied), over a generated corpus of adversarial strings.

One batch job per cleaner: the corpus goes through Spark once and every
row is compared, which keeps the property-test cheap enough for CI.
"""

from __future__ import annotations

import random
import re

import pytest
from pyspark.sql import types as T

from simple_etl_pipeline_spark.functions.cleaning import (
    clean_colors_col,
    clean_price_col,
    clean_rating_col,
    clean_size_col,
)


# --- Python spec implementations (the de-facto reference semantics) ------
def clean_price_py(value):
    if value is None or value == "":
        return None
    try:
        s = re.sub(r"[^0-9.,]", "", str(value))
        if not s:
            return None
        if "," in s and "." not in s:
            s = s.replace(",", ".")
        else:
            s = s.replace(",", "")
        return float(s) * 16000.0
    except (ValueError, TypeError):
        return None


def clean_rating_py(value):
    if value is None or value == "":
        return None
    m = re.search(r"([0-9]+(?:\.[0-9]+)?)", str(value))
    return float(m.group(1)) if m else None


def clean_colors_py(value):
    if not value or value == "Unknown Colors":
        return None
    m = re.search(r"([0-9]+)", str(value))
    return int(m.group(1)) if m else None


def clean_size_py(value):
    if value is None or not isinstance(value, str) or value == "":
        return None
    s = re.sub(r"(?i)^Size:\s*", "", value).strip()
    return s or None


# --- corpus generation ----------------------------------------------------
def _corpus(seed: int = 42, n: int = 400) -> list[str | None]:
    rng = random.Random(seed)
    pieces = [
        "$", "Rp", "USD ", "", " ", ",", ".", "..", ",,", "0", "7", "42",
        "1,000", "99.99", "100,50", "1.2.3", "N/A", "Colors", "Size:",
        "size:  ", "abc", "⭐", "/ 5", "out of 5", "-", "+",
    ]
    out: list[str | None] = [None, "", "N/A", "Unknown Colors", "Size: "]
    for _ in range(n):
        k = rng.randint(1, 5)
        out.append("".join(rng.choice(pieces) for _ in range(k)))
    return out


@pytest.mark.parametrize(
    "col_fn,py_fn,out_type",
    [
        (clean_price_col, clean_price_py, "double"),
        (clean_rating_col, clean_rating_py, "double"),
        (clean_colors_col, clean_colors_py, "long"),
        (clean_size_col, clean_size_py, "string"),
    ],
    ids=["price", "rating", "colors", "size"],
)
def test_differential_cleaners(spark, col_fn, py_fn, out_type):
    values = _corpus()
    df = spark.createDataFrame(
        [(v,) for v in values], T.StructType([T.StructField("c", T.StringType())])
    )
    got = [r.out for r in df.select(col_fn("c").alias("out")).collect()]
    for v, g in zip(values, got):
        e = py_fn(v)
        if isinstance(e, float):
            assert g == pytest.approx(e), f"input {v!r}: spark={g!r} py={e!r}"
        else:
            assert g == e, f"input {v!r}: spark={g!r} py={e!r}"
