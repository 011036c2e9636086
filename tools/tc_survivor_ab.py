"""Interleaved A/B for the txt_training_corpus survivor restructure (r15).

A = the pre-change shape (fp aggregation producing a survivor id list,
then a doc_id left-semi join back onto a SECOND tokenize of quality).
B = the registered query (min-struct survivor selected inside the fp
aggregation; one tokenize pass, no semi-join).

clearCache() before every rep; reps alternate A/B within the same
wall-clock window so host drift hits both sides equally.

Usage: python tools/tc_survivor_ab.py [sf_dir] [reps]
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
    MIN_TOKENS,
    fingerprint_col,
    tokens_col,
)
from simple_etl_pipeline_spark.functions.agg import davg
from simple_etl_pipeline_spark.schemas import load_table

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 5


def variant_a(spark, sf_dir):
    """The pre-restructure query shape, verbatim."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text", "lang")
    exact = docs.filter(F.col("doc_id") % 17 == 0).select(
        (F.col("doc_id") + 1000000).alias("doc_id"), "text", "lang"
    )
    corpus = docs.unionByName(exact)
    quality = corpus.withColumn("n_tokens", F.size(tokens_col("text"))).filter(
        F.col("n_tokens") >= MIN_TOKENS
    )
    survivors = (
        quality.select("doc_id", fingerprint_col("text").alias("fp"))
        .groupBy("fp")
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )
    return (
        quality.join(survivors, "doc_id", "left_semi")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").cast("bigint").alias("sum_tokens"),
            davg("n_tokens").alias("avg_tokens"),
        )
        .orderBy("lang")
    )


def main():
    spark = get_spark(app_name="tc_survivor_ab")
    spark.sparkContext.setLogLevel("ERROR")
    qb = entrymod.queries()["txt_training_corpus"]
    spark.catalog.clearCache()
    variant_a(spark, SF_DIR).count()
    spark.catalog.clearCache()
    qb(spark, SF_DIR).count()
    times = {"a_semijoin": [], "b_minstruct": []}
    for _ in range(REPS):
        for key, fn in (("a_semijoin", variant_a), ("b_minstruct", qb)):
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
