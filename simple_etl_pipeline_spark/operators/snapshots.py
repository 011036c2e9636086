"""Dataset versioning: immutable snapshot writes + pinned reads.

A training run must be able to name the EXACT bytes it consumed
("trained on corpus v12") and re-read them years later, even as the
table keeps ingesting. The minimal lakehouse pattern, engine-free:
each version is an immutable directory (`v=N/`), a tiny JSON manifest
names the latest; readers pin a version or resolve the manifest at
read time. Old versions are never mutated — retention is an explicit
garbage-collection decision, not a side effect of writes.

This is the governance complement to operators/cdc.py (which mutates
the LIVE table): snapshot what CDC maintains, train against the
snapshot. No reference equivalent; SURVEY §2f extension.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession


def _manifest_path(table_path: str) -> str:
    return os.path.join(table_path, "_manifest.json")


def list_versions(table_path: str) -> list[int]:
    mf = _manifest_path(table_path)
    if not os.path.exists(mf):
        return []
    with open(mf) as f:
        return sorted(json.load(f)["versions"])


def _existing_version_dirs(table_path: str) -> list[int]:
    """v=N directories on disk, committed or not (orphan detection)."""
    if not os.path.isdir(table_path):
        return []
    out = []
    for name in os.listdir(table_path):
        if name.startswith("v=") and name[2:].isdigit():
            out.append(int(name[2:]))
    return sorted(out)


def write_version(df: DataFrame, table_path: str) -> int:
    """Write ``df`` as the next immutable version; returns its number.

    The data lands fully under ``v=N/`` BEFORE the manifest names it, so
    a reader never resolves a half-written version. Crash-safety of the
    commit point itself:

    - the manifest is written to a temp file and os.rename'd into place
      (atomic on POSIX), so a concurrent reader never observes
      empty/partial JSON from an in-place truncate;
    - the next version number is max(manifest versions, v=* dirs on
      disk) + 1, so a crash after the parquet write but before the
      manifest rename leaves an orphan directory that is simply skipped
      — it never collides with (and permanently wedges) the next write.
      Orphans are invisible to readers (not in the manifest) and can be
      garbage-collected at leisure."""
    versions = list_versions(table_path)
    on_disk = _existing_version_dirs(table_path)
    n = max(versions + on_disk, default=0) + 1
    df.write.mode("errorifexists").parquet(os.path.join(table_path, f"v={n}"))
    mf = _manifest_path(table_path)
    tmp = mf + ".tmp"
    with open(tmp, "w") as f:
        json.dump({"versions": versions + [n], "latest": n}, f)
    os.rename(tmp, mf)
    return n


def read_version(
    spark: SparkSession, table_path: str, version: int | None = None
) -> DataFrame:
    """Read a pinned version (or the manifest's latest)."""
    versions = list_versions(table_path)
    if not versions:
        raise ValueError(f"no versions at {table_path}")
    if version is None:
        version = versions[-1]
    if version not in versions:
        raise ValueError(f"version {version} not in {versions}")
    return spark.read.parquet(os.path.join(table_path, f"v={version}"))
