"""CDC merge semantics: latest-wins upserts, deletes, tie-breaking,
idempotency."""

from __future__ import annotations

from simple_etl_pipeline_spark.operators.cdc import merge_changes


def _snap(spark):
    return spark.createDataFrame(
        [(1, "alice", 10.0, 100), (2, "bob", 20.0, 100), (3, "carol", 30.0, 100)],
        "k int, name string, v double, ts int",
    )


def _state(df):
    return sorted(tuple(r) for r in df.collect())


def test_upsert_insert_delete(spark):
    changes = spark.createDataFrame(
        [
            (2, "bob2", 25.0, 200, "U"),   # update
            (4, "dave", 40.0, 200, "U"),   # insert
            (3, None, None, 200, "D"),     # delete
        ],
        "k int, name string, v double, ts int, op string",
    )
    out = merge_changes(_snap(spark), changes, ["k"], "ts")
    assert _state(out) == [
        (1, "alice", 10.0, 100),
        (2, "bob2", 25.0, 200),
        (4, "dave", 40.0, 200),
    ]


def test_latest_change_wins_and_ties_beat_base(spark):
    changes = spark.createDataFrame(
        [
            (1, "a1", 11.0, 150, "U"),
            (1, "a2", 12.0, 300, "U"),     # newest wins
            (2, "bob-tied", 21.0, 100, "U"),  # same ts as base: change wins
        ],
        "k int, name string, v double, ts int, op string",
    )
    out = merge_changes(_snap(spark), changes, ["k"], "ts")
    rows = {r.k: (r.name, r.v) for r in out.collect()}
    assert rows[1] == ("a2", 12.0)
    assert rows[2] == ("bob-tied", 21.0)


def test_merge_is_idempotent(spark):
    changes = spark.createDataFrame(
        [(2, "bob2", 25.0, 200, "U"), (3, None, None, 200, "D")],
        "k int, name string, v double, ts int, op string",
    )
    once = merge_changes(_snap(spark), changes, ["k"], "ts")
    twice = merge_changes(once, changes, ["k"], "ts")
    assert _state(once) == _state(twice)


def test_merge_plan_has_no_join(spark):
    changes = spark.createDataFrame(
        [(2, "bob2", 25.0, 200, "U")], "k int, name string, v double, ts int, op string"
    )
    out = merge_changes(_snap(spark), changes, ["k"], "ts")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan
    # Spark pushes a partial per-key top-1 below the shuffle: only each
    # input partition's newest row per key travels, not the whole batch.
    assert "WindowGroupLimit" in plan


def test_delete_keys_rewrites_only_affected_partitions(spark, tmp_path):
    """GDPR delete: target users vanish, other rows survive, and files in
    partitions without the users keep their exact mtime (never rewritten)."""
    import glob
    import os

    from pyspark.sql import functions as F

    from simple_etl_pipeline_spark.operators.cdc import delete_keys

    path = str(tmp_path / "events")
    df = spark.createDataFrame(
        [(u, d, u * 100 + i) for u in range(1, 5) for i, d in enumerate(("d1", "d2"))]
        + [(9, "d3", 999)],  # user 9 only in d3
        "user_id int, event_date string, payload int",
    )
    df.write.partitionBy("event_date").parquet(path)
    before = {
        f: os.path.getmtime(f)
        for f in glob.glob(path + "/event_date=d3/*.parquet")
    }

    keys = spark.createDataFrame([(2,), (3,)], "user_id int")
    affected = delete_keys(spark, path, "user_id", keys)
    assert sorted(affected) == ["d1", "d2"]

    back = spark.read.parquet(path)
    assert back.filter(F.col("user_id").isin(2, 3)).count() == 0
    assert back.count() == 5  # users 1, 4 in d1+d2, user 9 in d3
    after = {
        f: os.path.getmtime(f)
        for f in glob.glob(path + "/event_date=d3/*.parquet")
    }
    assert before == after  # d3 never rewritten

    # no matching keys -> no-op, no partitions touched
    assert delete_keys(spark, path, "user_id", spark.createDataFrame([(77,)], "user_id int")) == []


def test_delete_keys_out_of_place_and_full_partition(spark, tmp_path):
    """The rewrite stages out-of-place (no .staging-delete/.old debris
    after commit), and a partition whose every row is deleted disappears
    entirely."""
    import os

    from pyspark.sql import functions as F

    from simple_etl_pipeline_spark.operators.cdc import delete_keys

    path = str(tmp_path / "events")
    spark.createDataFrame(
        [(1, "d1", 10), (2, "d1", 20), (2, "d2", 21)],
        "user_id int, event_date string, payload int",
    ).write.partitionBy("event_date").parquet(path)

    affected = delete_keys(
        spark, path, "user_id", spark.createDataFrame([(2,)], "user_id int")
    )
    assert sorted(affected) == ["d1", "d2"]
    back = spark.read.parquet(path)
    assert [(r.user_id, r.event_date) for r in back.collect()] == [(1, "d1")]
    # d2 lost its only row -> directory gone; no staging/old leftovers
    assert not os.path.exists(path + "/event_date=d2")
    assert not os.path.exists(path + ".staging-delete")
    assert not any(n.endswith(".old") for n in os.listdir(path))


def test_delete_keys_recovers_half_finished_swap(spark, tmp_path):
    """A crash between dir->old and staging->dir leaves partition.old with
    no partition; the next call restores it before doing new work."""
    import os

    from simple_etl_pipeline_spark.operators.cdc import delete_keys

    path = str(tmp_path / "events")
    spark.createDataFrame(
        [(1, "d1", 10), (2, "d2", 20)],
        "user_id int, event_date string, payload int",
    ).write.partitionBy("event_date").parquet(path)
    os.rename(path + "/event_date=d1", path + "/event_date=d1.old")

    affected = delete_keys(
        spark, path, "user_id", spark.createDataFrame([(2,)], "user_id int")
    )
    assert affected == ["d2"]
    back = spark.read.parquet(path)
    assert [(r.user_id, r.event_date) for r in back.collect()] == [(1, "d1")]
