"""Adversarial EVENTS corpus through the driver's exact oracle compare
— the events-family twin of test_adversarial_text: same-timestamp
ties, null/malformed JSON props, negative and extreme values,
single-event users, one flood user, boundary-aligned timestamps.
Every events-only oracle query must hash-match DuckDB on it.
"""

from __future__ import annotations

import datetime as dt
import os

import pytest

import __spark_entry__ as entrymod
from simple_etl_pipeline_spark.schemas import TESTDATA_TABLES
from simple_etl_pipeline_spark.testing import compare_with_oracle

QUERIES = entrymod.queries()
# demoted-from-registry queries stay under the same test discipline
from simple_etl_pipeline_spark.testing import demoted_queries as _dq  # noqa: E402
QUERIES.update({k: fn for k, (fn, _) in _dq().items()})
ORACLES = entrymod.oracle_sql()
ORACLES.update({k: sql for k, (_, sql) in _dq().items()})

_T0 = dt.datetime(2024, 3, 1, 0, 0, 0)


def _ts(minutes: float) -> dt.datetime:
    return _T0 + dt.timedelta(minutes=minutes)


EDGE_EVENTS = [
    # (event_id, ts, user_id, event_type, value, props)
    # same-timestamp tie pair (session/lag tie-break hazard)
    (1, _ts(0), 1, "view", 1.0, '{"k": 1}'),
    (2, _ts(0), 1, "click", 2.0, '{"k": 2}'),
    # exact window-boundary events (hour + 30-min slide edges)
    (3, _ts(60), 1, "view", 0.5, "{}"),
    (4, _ts(90), 1, "purchase", 100.0, None),  # null props
    # malformed JSON props
    (5, _ts(95), 2, "view", 3.0, "{not json"),
    # negative + extreme magnitudes (decimal-sum stress)
    (6, _ts(100), 2, "click", -7.25, '{"k": -3}'),
    (7, _ts(105), 2, "purchase", 1e12, '{"k": 999999}'),
    (8, _ts(110), 2, "view", -1e12, '{"j": 1}'),  # missing k key
    # single-event user
    (9, _ts(200), 3, "view", 0.0, "{}"),
    # a flood user: 40 events straddling a session gap
    *[
        (10 + i, _ts(300 + i * (31 if i == 20 else 1)), 4, "view", float(i), '{"k": 7}')
        for i in range(40)
    ],
    # exactly prev_ts + 30min — MERGES (Spark's close boundary is
    # inclusive; the oracle's strict-> rule encodes exactly this)
    (60, _ts(500), 5, "view", 1.0, "{}"),
    (61, _ts(530), 5, "view", 1.0, "{}"),
    # error events open incident windows for the overlap join,
    # including one exactly at a session edge
    (62, _ts(505), 5, "error", 1.0, "{}"),
    (63, _ts(330), 4, "error", 2.0, "{}"),
]

# events-only oracle queries (skip ones that join other tables or whose
# corpus is table-specific): this is every ev_* plus the batch window
# family the streaming twins mirror.
ADVERSARIAL_EV_QUERIES = [
    "ev_tumbling_hourly",
    "ev_sliding_windows",
    "ev_session_windows",
    "ev_funnel",
    "ev_json_extract",
    "ev_json_variant",
    "ev_user_daily_activity",
    "ev_rollup_multires",
    "ev_heavy_hitters",
    "ev_retention_cohorts",
    "ev_zscore_outliers",
    "ev_countmin_users",
    "ev_scd2_users",
    "ev_zorder_layout",
    "ev_asof_purchase_click",
    "ev_range_join_nearby",
    "ev_overlap_incident_sessions",
    "ev_range_join_incidents",
    # streaming twins: availableNow replay over the same edge corpus —
    # watermark/state paths must reproduce the corrected batch oracles
    # (incl. the inclusive session-gap boundary) exactly
    "st_tumbling_hourly",
    "st_sliding_windows",
    "st_session_windows",
    "st_dedup_events",
    "st_user_totals_stateful",
    "st_scd2_users",
    "st_static_zscore",
]


@pytest.fixture(scope="module")
def edge_ev_dir(spark, sf_dir, tmp_path_factory) -> str:
    d = tmp_path_factory.mktemp("edge_ev")
    import pyarrow as pa
    import pyarrow.parquet as pq

    table = pa.table(
        {
            "event_id": pa.array([r[0] for r in EDGE_EVENTS], pa.int64()),
            "ts": pa.array([r[1] for r in EDGE_EVENTS], pa.timestamp("us")),
            "user_id": pa.array([r[2] for r in EDGE_EVENTS], pa.int64()),
            "event_type": pa.array([r[3] for r in EDGE_EVENTS], pa.string()),
            "value": pa.array([r[4] for r in EDGE_EVENTS], pa.float64()),
            "props": pa.array([r[5] for r in EDGE_EVENTS], pa.string()),
        }
    )
    pq.write_table(table, str(d / "events.parquet"))
    for t in TESTDATA_TABLES:
        if t != "events":
            os.symlink(f"{sf_dir}/{t}.parquet", str(d / f"{t}.parquet"))
    return str(d)


@pytest.mark.parametrize("name", ADVERSARIAL_EV_QUERIES)
def test_edge_events_oracle_parity(spark, edge_ev_dir, name):
    df = QUERIES[name](spark, edge_ev_dir)
    compare_with_oracle(df, ORACLES[name], edge_ev_dir)
