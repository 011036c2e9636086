"""Pipeline-level spec: the 3-row dirty fixture from the reference
(/root/reference/tests/test_transform.py:14-23,85-106; FIXTURES.md §1).
"""

from __future__ import annotations

import pytest

from simple_etl_pipeline_spark.operators.transform import remove_dirty_data, transform_data
from simple_etl_pipeline_spark.schemas import RAW_PRODUCT_SCHEMA

FIXTURE = [
    # row1: fully clean
    ("Test Product", "$99.99", "4.5 / 5", "3 Colors", "Size: M", "Gender: Unisex", "2025-05-17T14:36:09"),
    # row2: fully dirty -> removed by F1
    ("Unknown Product", "N/A", "N/A", "Unknown Colors", "", "", "2025-05-17T14:36:09"),
    # row3: clean, alternate formats
    ("Valid Product", "100,50", "3.2 out of 5", "2 Colors", "Size: L", "Gender: Male", "2025-05-17T14:36:09"),
]


@pytest.fixture()
def raw(spark):
    return spark.createDataFrame(FIXTURE, RAW_PRODUCT_SCHEMA)


def test_remove_dirty(raw):
    assert remove_dirty_data(raw).count() == 2


def test_full_transform_values(raw):
    out = transform_data(raw).orderBy("title").collect()
    assert len(out) == 2
    r1, r3 = out
    assert r1.title == "Test Product"
    assert r1.price == pytest.approx(1599840.0)
    assert r1.rating == pytest.approx(4.5)
    assert r1.colors == 3
    assert r1.size == "M"
    assert r1.gender == "Unisex"
    assert r3.title == "Valid Product"
    assert r3.price == pytest.approx(1608000.0)  # 100.50 * 16000
    assert r3.rating == pytest.approx(3.2)
    assert r3.colors == 2
    assert r3.size == "L"
    assert r3.gender == "Male"


def test_missing_columns_yields_empty(spark):
    df = spark.createDataFrame([("only title",)], "title string")
    out = transform_data(df)
    assert out.count() == 0
    assert out.schema.fieldNames() == [
        "title", "price", "rating", "colors", "size", "gender", "timestamp",
    ]


def test_null_in_clean_subset_drops_row(spark):
    rows = [
        ("Good", "$10.00", "4.0 / 5", "3 Colors", "Size: M", "Gender: Men", "t"),
        ("No colors", "$10.00", "4.0 / 5", "no digits", "Size: M", "Gender: Men", "t"),
    ]
    df = spark.createDataFrame(rows, RAW_PRODUCT_SCHEMA)
    out = transform_data(df).collect()
    assert [r.title for r in out] == ["Good"]
