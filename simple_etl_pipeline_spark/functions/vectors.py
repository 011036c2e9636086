"""Vector math over array<float> embedding columns — native Column
expressions (zip_with/aggregate fold in array order inside codegen; no
Python). Cosine outputs are rounded to 6 decimals in queries: IEEE
double +,*,/ and sqrt are exactly rounded and engine-identical, but
different engines may factor the norm product differently, so the last
couple of bits can differ — rounding absorbs that.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def as_double_array(c: Column | str) -> Column:
    c = F.col(c) if isinstance(c, str) else c
    return F.transform(c, lambda x: x.cast("double"))


def dot_col(a: Column, b: Column) -> Column:
    """Sequential left-fold dot product in double (array order)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm_col(a: Column) -> Column:
    return F.sqrt(dot_col(a, a))


def cosine_col(a: Column, b: Column) -> Column:
    return dot_col(a, b) / (norm_col(a) * norm_col(b))
