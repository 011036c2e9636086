"""CDC merge: apply an insert/update/delete change batch to a snapshot.

The lakehouse MERGE INTO shape without an engine extension: union the
snapshot with the change batch and keep the newest row per key (change
rows outrank snapshot rows on timestamp ties), dropping keys whose
newest row is a delete. One window over one key-partitioned shuffle —
no join, so there is no skew-sensitive build side and AQE handles hot
keys like any aggregation.

At 100 TB the snapshot is date/bucket-partitioned: prune the union's
snapshot side to the partitions present in the change batch (semi-join
on partition values — tiny) and rewrite only those via dynamic
partition overwrite (operators/partitioning.overwrite_day). The merge
itself is unchanged.

No reference equivalent (the reference overwrites its whole CSV/table
per run, utils/load.py); extension surface per SURVEY §2f.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

OP_UPSERT = "U"
OP_DELETE = "D"


def merge_changes(
    base: DataFrame,
    changes: DataFrame,
    key_cols: list[str],
    ts_col: str,
    op_col: str = "op",
) -> DataFrame:
    """Return the post-merge snapshot.

    ``base``: current snapshot, one row per key, NO op column.
    ``changes``: change rows carrying ``op_col`` (OP_UPSERT/OP_DELETE)
    and the same data columns. Newest ``ts_col`` per key wins; a change
    row beats a base row at equal timestamp; a winning delete removes
    the key. Applying the same batch twice is a no-op (idempotent).
    """
    b = base.withColumn(op_col, F.lit(OP_UPSERT)).withColumn("__src", F.lit(0))
    c = changes.withColumn("__src", F.lit(1))
    w = Window.partitionBy(*key_cols).orderBy(
        F.desc(ts_col), F.desc("__src")
    )
    return (
        b.unionByName(c)
        .withColumn("__rn", F.row_number().over(w))
        .filter((F.col("__rn") == 1) & (F.col(op_col) != OP_DELETE))
        .drop("__rn", "__src", op_col)
    )


def delete_keys(
    spark,
    path: str,
    key_col: str,
    keys: DataFrame,
    partition_col: str = "event_date",
) -> list:
    """Right-to-be-forgotten: remove all rows for ``keys`` from a
    partitioned parquet table, rewriting ONLY the partitions that
    contain them.

    Four steps: (1) find affected partition values with a semi-join —
    the collect is partition METADATA (thousands of values at most),
    never data; (2) anti-join those partitions' rows against the keys;
    (3) write the survivors OUT-OF-PLACE to a staging directory — the
    lazy read of ``path`` fully materializes before anything under
    ``path`` is touched, so a mid-job failure leaves the table intact
    (an in-place dynamic overwrite would be reading the same files its
    commit deletes); (4) swap each affected partition directory in via
    rename (dir -> .old, staging -> dir, drop .old), mirroring
    stream_upsert_snapshot's .next+rename commit. A 100 TB table with 3
    affected days rewrites 3 directories; every other file is untouched
    (asserted by mtime in tests). Returns the affected partition values.

    Single-writer, local-FS commit (os.rename) — same contract as
    stream_upsert_snapshot; on HDFS/object stores the swap maps onto the
    store's rename/commit API. A crash mid-swap leaves a ``.old`` dir
    next to a missing partition; the recovery pass at function start
    restores it before doing new work.
    """
    import os
    import shutil

    staging = path.rstrip("/") + ".staging-delete"
    # Recover from a previous crash: restore any partition whose swap
    # half-finished (dir gone, .old still there), then clear stale runs.
    if os.path.isdir(path):
        for name in os.listdir(path):
            if name.endswith(".old"):
                orig = os.path.join(path, name[: -len(".old")])
                old = os.path.join(path, name)
                if os.path.exists(orig):
                    shutil.rmtree(old)
                else:
                    os.rename(old, orig)
    shutil.rmtree(staging, ignore_errors=True)

    table = spark.read.parquet(path)
    affected = [
        r[0]
        for r in table.join(F.broadcast(keys), key_col, "left_semi")
        .select(partition_col)
        .distinct()
        .collect()
    ]
    if not affected:
        return []
    remaining = table.filter(F.col(partition_col).isin(affected)).join(
        F.broadcast(keys), key_col, "left_anti"
    )
    remaining.write.mode("overwrite").partitionBy(partition_col).parquet(staging)
    for v in affected:
        sub = f"{partition_col}={v}"
        src = os.path.join(staging, sub)
        dst = os.path.join(path, sub)
        old = dst + ".old"
        if os.path.exists(old):
            shutil.rmtree(old)
        os.rename(dst, old)
        if os.path.isdir(src):
            os.rename(src, dst)
        # else: every row of this partition was deleted — dir stays gone
        shutil.rmtree(old)
    shutil.rmtree(staging, ignore_errors=True)
    return affected
