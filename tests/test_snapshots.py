"""Snapshot versioning: pinned reads are immutable across later writes;
the manifest is the commit point."""

from __future__ import annotations

import pytest

from simple_etl_pipeline_spark.operators.snapshots import (
    list_versions,
    read_version,
    write_version,
)


def test_versions_are_immutable_and_pinned(spark, tmp_path):
    path = str(tmp_path / "corpus")
    v1 = write_version(spark.range(5).selectExpr("id", "id * 2 AS v"), path)
    v2 = write_version(spark.range(8).selectExpr("id", "id * 3 AS v"), path)
    assert (v1, v2) == (1, 2)
    assert list_versions(path) == [1, 2]

    pinned = read_version(spark, path, version=1)
    assert pinned.count() == 5
    assert read_version(spark, path).count() == 8  # latest
    # a later write never changes what v1 returns
    write_version(spark.range(2), path)
    assert read_version(spark, path, version=1).count() == 5
    assert read_version(spark, path).count() == 2


def test_read_errors(spark, tmp_path):
    path = str(tmp_path / "empty")
    with pytest.raises(ValueError, match="no versions"):
        read_version(spark, path)
    write_version(spark.range(1), path)
    with pytest.raises(ValueError, match="not in"):
        read_version(spark, path, version=7)


def test_orphan_version_dir_does_not_wedge_table(spark, tmp_path):
    """Crash between the v=N parquet write and the manifest rename
    leaves an orphan v=N dir. The next write must skip past it instead
    of colliding on errorifexists forever."""
    path = str(tmp_path / "corpus")
    write_version(spark.range(3), path)  # v1, committed
    # simulate the crash: v2 data exists, manifest never updated
    spark.range(4).write.parquet(f"{path}/v=2")
    assert list_versions(path) == [1]

    v = write_version(spark.range(6), path)
    assert v == 3  # skipped the orphan
    assert list_versions(path) == [1, 3]
    assert read_version(spark, path).count() == 6
    # orphan stays invisible to readers
    with pytest.raises(ValueError, match="not in"):
        read_version(spark, path, version=2)


def test_manifest_write_is_atomic_rename(spark, tmp_path):
    """No .tmp leftover after a successful commit; manifest is valid JSON
    at the final path."""
    import json
    import os

    path = str(tmp_path / "corpus")
    write_version(spark.range(2), path)
    assert not os.path.exists(os.path.join(path, "_manifest.json.tmp"))
    with open(os.path.join(path, "_manifest.json")) as f:
        assert json.load(f)["latest"] == 1
