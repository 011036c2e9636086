"""Training-epoch data ordering — the last mile between a curated
corpus and a dataloader.

A training run needs, per epoch, a PERMUTATION of the corpus that is
(a) different every epoch, (b) exactly reproducible from (seed, epoch)
for resume/replay/audit, and (c) computable distributedly with no
global sort of the corpus. rand() fails (b) and (c); this module uses
the repo's standard md5 trick: hash (seed, epoch, key) to a 60-bit
order value, shard by its modulus, and sort only WITHIN shards —
a dataloader then streams shards in numeric order, which is a
fixed-size file listing, while each shard's internal order is the
hash order. The permutation quality is that of the hash (uniform),
the cost is one narrow map + a partitionBy write, and re-running any
epoch — on any cluster size or partitioning — yields byte-identical
shard files.

Reference has nothing like it (SURVEY.md §2f); this is the
epoch-shuffle every large-scale trainer implements (e.g. the
shard-shuffle + intra-shard-shuffle scheme of WebDataset/Megatron
loaders), expressed as DataFrame ops.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from simple_etl_pipeline_spark.functions.text import md5_hash60


def epoch_order(
    df: DataFrame,
    key_col: str,
    seed: int,
    epoch: int,
    n_shards: int,
) -> DataFrame:
    """Annotate rows with their (shard, epoch_ord) for one epoch.

    epoch_ord is the 60-bit md5 of (seed, epoch, key) — a deterministic
    pseudo-random total order; shard = epoch_ord % n_shards, so shard
    membership AND intra-shard order both reshuffle every epoch. Narrow
    map only; nothing shuffles until a writer partitions by shard."""
    h = md5_hash60(
        F.concat_ws(
            "|",
            F.lit(int(seed)).cast("string"),
            F.lit(int(epoch)).cast("string"),
            F.col(key_col).cast("string"),
        )
    )
    return df.withColumn("epoch_ord", h).withColumn(
        "shard", F.pmod(F.col("epoch_ord"), F.lit(n_shards)).cast("int")
    )


def write_epoch_shards(
    df: DataFrame,
    key_col: str,
    seed: int,
    epoch: int,
    n_shards: int,
    path: str,
) -> None:
    """Materialize one epoch's shard layout: shard=N directories, rows
    inside each file sorted by epoch_ord (sortWithinPartitions — a
    per-shard sort, never a global one). repartition on shard makes one
    task own each shard so the sorted run is a single file per shard."""
    (
        epoch_order(df, key_col, seed, epoch, n_shards)
        .repartition(n_shards, F.col("shard"))
        .sortWithinPartitions("epoch_ord")
        .write.mode("overwrite")
        .partitionBy("shard")
        .parquet(path)
    )
