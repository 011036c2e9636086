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


def write_version(df: DataFrame, table_path: str) -> int:
    """Write ``df`` as the next immutable version; returns its number.

    The data lands fully under ``v=N/`` BEFORE the manifest names it, so
    a reader never resolves a half-written version (the manifest write
    is the commit point, same discipline as a lakehouse transaction
    log's atomic append)."""
    versions = list_versions(table_path)
    n = (versions[-1] + 1) if versions else 1
    df.write.mode("errorifexists").parquet(os.path.join(table_path, f"v={n}"))
    with open(_manifest_path(table_path), "w") as f:
        json.dump({"versions": versions + [n], "latest": n}, f)
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
