"""operators/training: epoch shuffling must be reproducible per
(seed, epoch), different across epochs, partition-invariant, balanced,
and a lossless permutation of the corpus."""

from __future__ import annotations

from pyspark.sql import functions as F

from simple_etl_pipeline_spark.operators.training import (
    epoch_order,
    write_epoch_shards,
)
from simple_etl_pipeline_spark.schemas import load_table


def _order(spark, sf_dir, seed, epoch, shards=8):
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    return [
        r.doc_id
        for r in epoch_order(docs, "doc_id", seed, epoch, shards)
        .orderBy("shard", "epoch_ord")
        .collect()
    ]


def test_epoch_order_reproducible_and_epoch_varying(spark, sf_dir):
    a = _order(spark, sf_dir, seed=7, epoch=0)
    b = _order(spark, sf_dir, seed=7, epoch=0)
    c = _order(spark, sf_dir, seed=7, epoch=1)
    d = _order(spark, sf_dir, seed=8, epoch=0)
    assert a == b  # same (seed, epoch) -> identical permutation
    assert a != c  # next epoch -> different permutation
    assert a != d  # different seed -> different permutation
    assert sorted(a) == sorted(c) == sorted(d)  # all true permutations


def test_epoch_order_partition_invariant(spark, sf_dir):
    conf = "spark.sql.shuffle.partitions"
    before = spark.conf.get(conf)
    try:
        spark.conf.set(conf, "1")
        one = _order(spark, sf_dir, seed=3, epoch=2)
        spark.conf.set(conf, "32")
        many = _order(spark, sf_dir, seed=3, epoch=2)
    finally:
        spark.conf.set(conf, before)
    assert one == many


def test_epoch_shards_balanced_and_sorted(spark, sf_dir, tmp_path):
    docs = load_table(spark, sf_dir, "documents")
    n_docs = docs.count()
    out = str(tmp_path / "epoch0")
    write_epoch_shards(docs, "doc_id", seed=1, epoch=0, n_shards=8, path=out)
    back = spark.read.parquet(out)
    assert back.count() == n_docs
    sizes = {r.shard: r.n for r in back.groupBy("shard").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert set(sizes) == set(range(8))
    # hash-uniform balance: no shard more than 2x the mean at 500 docs
    mean = n_docs / 8
    assert all(n < 2 * mean for n in sizes.values()), sizes
    # intra-shard order is the epoch_ord run (files written sorted)
    for shard in (0, 3, 7):
        ords = [
            r.epoch_ord
            for r in back.filter(F.col("shard") == shard)
            .orderBy("epoch_ord")
            .collect()
        ]
        assert ords == sorted(ords) and len(set(ords)) == len(ords)


def test_shard_manifest_matches_physical_layout(spark, sf_dir, tmp_path):
    """train_shard_manifest (the driver-registered oracle surface) must
    describe EXACTLY the layout write_epoch_shards materializes at the
    same (seed, epoch, n_shards) — the manifest is the audit a resumed
    trainer runs against its shard files."""
    from simple_etl_pipeline_spark.plans.text import (
        TRAIN_EPOCH,
        TRAIN_SEED,
        TRAIN_SHARDS,
        train_shard_manifest,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    out = str(tmp_path / "epoch_m")
    write_epoch_shards(
        docs, "doc_id", seed=TRAIN_SEED, epoch=TRAIN_EPOCH,
        n_shards=TRAIN_SHARDS, path=out,
    )
    physical = {
        r.shard: (r.n_rows, r.xor_ord, r.min_ord, r.max_ord)
        for r in spark.read.parquet(out)
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.expr("bit_xor(epoch_ord)").alias("xor_ord"),
            F.min("epoch_ord").alias("min_ord"),
            F.max("epoch_ord").alias("max_ord"),
        )
        .collect()
    }
    manifest = {
        r.shard: (r.n_rows, r.xor_ord, r.min_ord, r.max_ord)
        for r in train_shard_manifest(spark, sf_dir).collect()
    }
    assert manifest == physical
