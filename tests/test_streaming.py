"""Structured Streaming: availableNow replays of the events file must
agree with the batch twins (semantics proven in plans/events.py)."""

from __future__ import annotations

from simple_etl_pipeline_spark.plans.events import ev_tumbling_hourly
from simple_etl_pipeline_spark.streaming.events import (
    st_dedup_events,
    st_session_windows,
    st_tumbling_hourly,
)


def test_streaming_tumbling_equals_batch(spark, sf_dir):
    batch = {
        (r.window_start, r.event_type): (r.n_events, r.sum_value)
        for r in ev_tumbling_hourly(spark, sf_dir).collect()
    }
    stream = {
        (r.window_start, r.event_type): (r.n_events, r.sum_value)
        for r in st_tumbling_hourly(spark, sf_dir).collect()
    }
    assert batch == stream


def test_streaming_dedup_exact(spark, sf_dir):
    from simple_etl_pipeline_spark.schemas import load_table

    n_events = load_table(spark, sf_dir, "events").count()
    deduped = st_dedup_events(spark, sf_dir)
    assert deduped.count() == n_events  # doubled stream -> unique survivors


def test_foreachbatch_csv_sink(spark, sf_dir, tmp_path):
    import csv
    import glob

    from simple_etl_pipeline_spark.streaming.events import read_events_stream
    from simple_etl_pipeline_spark.streaming.sinks import stream_to_csv_batches

    stream = read_events_stream(spark, sf_dir).select("event_id", "event_type")
    q = stream_to_csv_batches(stream, str(tmp_path))
    q.awaitTermination()
    files = glob.glob(str(tmp_path / "batch_*.csv"))
    assert files, "no batch files written"
    total = 0
    for f in files:
        with open(f) as fh:
            total += sum(1 for _ in csv.DictReader(fh))
    from simple_etl_pipeline_spark.schemas import load_table

    assert total == load_table(spark, sf_dir, "events").count()


def test_streaming_sessions_run(spark, sf_dir):
    out = st_session_windows(spark, sf_dir)
    # append mode withholds sessions not yet past the watermark; emitted
    # ones must be plausible sessions
    rows = out.collect()
    assert all(r.session_end >= r.session_start for r in rows)
