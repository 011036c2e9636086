"""Interleaved A/B for the txt_lm_perplexity persist change (r15).

A = the pre-change shape (no persists: the corpus bigram explode runs
once per consumer subtree — 4 documents scans per execution).
B = the registered query (per_doc + bg_counts persisted).

spark.catalog.clearCache() runs before EVERY rep so neither variant can
read the other's cache (CacheManager substitutes by sameResult), and
reps alternate A/B within the same wall-clock window so host drift hits
both sides equally. Each rep times a full cold build + count.

Usage: python tools/lm_persist_ab.py [sf_dir] [reps]
"""
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from pyspark.sql import functions as F
from simple_etl_pipeline_spark.session import get_spark
from simple_etl_pipeline_spark.plans.text import (
    LM_XENT_KEEP_MICROBITS,
    tokens_col,
)
from simple_etl_pipeline_spark.schemas import load_table

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 5


def variant_a(spark, sf_dir):
    """The pre-persist query shape, verbatim."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", tokens_col("text").alias("toks")
    ).filter(F.size("toks") >= 2)
    big = toks.select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(sequence(1, size(toks) - 1),"
                " i -> struct(toks[i-1] AS w1, toks[i] AS w2))"
            )
        ).alias("bg"),
    ).select("doc_id", "bg.w1", "bg.w2")
    per_doc = big.groupBy("doc_id", "w1", "w2").agg(
        F.count(F.lit(1)).alias("c")
    )
    bg_counts = per_doc.groupBy("w1", "w2").agg(F.sum("c").alias("c12"))
    ctx_counts = bg_counts.groupBy("w1").agg(F.sum("c12").alias("c1"))
    vocab = bg_counts.select("w2").distinct().agg(
        F.count(F.lit(1)).alias("v")
    )
    mlog2 = lambda c: F.round(F.log2(c) * 1e6, 0).cast("bigint")  # noqa: E731
    term = mlog2(F.col("c1") + F.col("v")) - mlog2(F.col("c12") + 1)
    return (
        per_doc.join(bg_counts, ["w1", "w2"])
        .join(ctx_counts, ["w1"])
        .crossJoin(F.broadcast(vocab))
        .groupBy("doc_id")
        .agg(
            F.sum("c").cast("bigint").alias("n_bigrams"),
            F.sum(F.col("c") * term).cast("bigint").alias("sw"),
        )
        .select(
            "doc_id",
            "n_bigrams",
            F.expr("sw div n_bigrams").alias("xent_microbits"),
        )
        .withColumn(
            "keep", F.col("xent_microbits") <= LM_XENT_KEEP_MICROBITS
        )
        .orderBy("doc_id")
    )


def main():
    spark = get_spark(app_name="lm_persist_ab")
    spark.sparkContext.setLogLevel("ERROR")
    qb = entrymod.queries()["txt_lm_perplexity"]
    # JIT/codegen warmup for both variants (untimed).
    spark.catalog.clearCache()
    variant_a(spark, SF_DIR).count()
    spark.catalog.clearCache()
    qb(spark, SF_DIR).count()
    times = {"a_nopersist": [], "b_persist": []}
    for _ in range(REPS):
        for key, fn in (("a_nopersist", variant_a), ("b_persist", qb)):
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            fn(spark, SF_DIR).count()
            times[key].append(time.perf_counter() - t0)
    spark.catalog.clearCache()
    for key, runs in times.items():
        print(
            f"{key}: median {statistics.median(runs):.3f}s"
            f" min {min(runs):.3f} max {max(runs):.3f}"
            f" runs {[round(r, 3) for r in runs]}"
        )
    spark.stop()


if __name__ == "__main__":
    main()
