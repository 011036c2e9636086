"""Sink spec, mirroring the reference's mocked load tests
(/root/reference/tests/test_load.py): CSV round-trip, empty-df errors,
JDBC param validation, Sheets via injected fake client, fan-out
isolation."""

from __future__ import annotations

import csv

import pytest

from simple_etl_pipeline_spark.sinks import LoadError, load_data, save_to_csv
from simple_etl_pipeline_spark.sinks.jdbc import build_jdbc_writer
from simple_etl_pipeline_spark.sinks.sheets import save_to_google_sheets


@pytest.fixture()
def small_df(spark):
    return spark.createDataFrame(
        [("A", 1.0), ("B", 2.0)], "title string, price double"
    )


def test_csv_roundtrip(small_df, tmp_path):
    path = save_to_csv(small_df, str(tmp_path), filename="out.csv")
    assert path.endswith("/out.csv")
    with open(path) as f:
        rows = list(csv.reader(f))
    assert rows[0] == ["title", "price"]
    assert sorted(r[0] for r in rows[1:]) == ["A", "B"]


def test_csv_empty_raises(spark, tmp_path):
    empty = spark.createDataFrame([], "title string")
    with pytest.raises(LoadError, match="empty"):
        save_to_csv(empty, str(tmp_path))


def test_csv_unwritable_path_raises(small_df):
    with pytest.raises(LoadError):
        save_to_csv(small_df, "/proc/definitely/not/writable")


def test_jdbc_param_validation(small_df):
    with pytest.raises(LoadError, match="missing connection params"):
        build_jdbc_writer(small_df, "t", {"host": "h", "user": "u"})
    with pytest.raises(LoadError, match="if_exists"):
        build_jdbc_writer(
            small_df,
            "t",
            {"host": "h", "database": "d", "user": "u", "password": "p"},
            if_exists="nope",
        )
    # valid params build a writer without touching a database
    w = build_jdbc_writer(
        small_df, "t", {"host": "h", "database": "d", "user": "u", "password": "p"}
    )
    assert w is not None


class FakeWorksheet:
    def __init__(self):
        self.updates = []

    def clear(self):
        pass

    def update(self, values):
        self.updates.append(values)


class FakeSheet:
    id = "fake123"
    url = "https://docs.google.com/spreadsheets/d/fake123"

    def __init__(self):
        self.ws = FakeWorksheet()
        self.shared = []

    def worksheet(self, name):
        return self.ws

    def share(self, who, perm_type, role):
        self.shared.append((who, perm_type, role))


class FakeClient:
    def __init__(self, sheet):
        self.sheet = sheet

    def open_by_key(self, key):
        return self.sheet

    def create(self, title):
        return self.sheet


def test_sheets_with_fake_client(small_df):
    sheet = FakeSheet()
    url = save_to_google_sheets(
        small_df,
        credentials_path="unused.json",
        spreadsheet_id="abc",
        client_factory=lambda: FakeClient(sheet),
    )
    assert url == sheet.url
    header, *data = sheet.ws.updates[0]
    assert header == ["title", "price"]
    assert len(data) == 2
    assert sheet.shared == [(None, "anyone", "reader")]


def test_sheets_empty_raises(spark):
    empty = spark.createDataFrame([], "title string")
    with pytest.raises(LoadError, match="empty"):
        save_to_google_sheets(empty, "unused.json", client_factory=lambda: None)


def test_fanout_requires_destination(small_df):
    with pytest.raises(ValueError, match="at least one destination"):
        load_data(small_df, save_csv=False, save_sheets=False, save_postgres=False)


def test_fanout_error_isolation(small_df, tmp_path):
    """Sheets fails (no gspread, no factory) but CSV succeeds — each sink
    is isolated (reference utils/load.py:282-286 semantics)."""
    results = load_data(
        small_df,
        save_csv=True,
        save_sheets=True,
        csv_options={"output_path": str(tmp_path)},
        sheets_options={"credentials_path": "/nonexistent.json"},
    )
    assert results["csv"].endswith("products.csv")
    assert results["sheets"] is None
    assert "sheets_error" in results
