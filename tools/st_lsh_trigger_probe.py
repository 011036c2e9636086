"""VERDICT r15 #3: measure st_dedup_lsh_index's micro-batch count vs
wall under different availableNow trigger sizings (maxFilesPerTrigger),
and decompose where the wall goes. The adapter is replicated inline so
the probe can read the StreamingQuery's progress (batch count, per-op
durations) that _run_to_memory hides.

Usage: python tools/st_lsh_trigger_probe.py [sf_dir] [reps]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time
import uuid

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from simple_etl_pipeline_spark.session import get_spark


def run_once(spark, sf_dir: str, max_files: int | None) -> dict:
    from simple_etl_pipeline_spark.plans.text import (
        inject_dup_variants,
        minhash_band_keys_stateless,
    )
    from simple_etl_pipeline_spark.schemas import TABLE_SCHEMAS
    from simple_etl_pipeline_spark.streaming.events import (
        _table_stream_source,
    )
    from simple_etl_pipeline_spark.streaming.stateful import lsh_bucket_index

    stream_dir, glob = _table_stream_source(sf_dir, "documents")
    reader = spark.readStream.option("pathGlobFilter", glob)
    if max_files is not None:
        reader = reader.option("maxFilesPerTrigger", max_files)
    docs = (
        reader.schema(TABLE_SCHEMAS["documents"])
        .parquet(stream_dir)
        .select("doc_id", "text")
    )
    corpus = inject_dup_variants(docs)
    result = lsh_bucket_index(minhash_band_keys_stateless(corpus))
    name = f"probe_{uuid.uuid4().hex[:12]}"
    t0 = time.perf_counter()
    q = (
        result.writeStream.format("memory")
        .queryName(name)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    wall = time.perf_counter() - t0
    prog = q.recentProgress
    n_rows = spark.table(name).count()
    spark.catalog.dropTempView(name)
    return {
        "max_files": max_files,
        "wall_s": round(wall, 3),
        "n_batches": len(prog),
        "batch_rows": [p["numInputRows"] for p in prog],
        "out_rows": n_rows,
    }


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = get_spark(app_name="st_lsh_trigger_probe", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet(f"{sf_dir}/region.parquet").count()
    configs = [1, None]  # file-at-a-time (current) vs all-at-once
    # warmup each config once
    for c in configs:
        run_once(spark, sf_dir, c)
    walls: dict[str, list[float]] = {str(c): [] for c in configs}
    last: dict[str, dict] = {}
    for _ in range(reps):
        for c in configs:
            r = run_once(spark, sf_dir, c)
            walls[str(c)].append(r["wall_s"])
            last[str(c)] = r
    for c in configs:
        r = last[str(c)]
        r["wall_median_s"] = round(statistics.median(walls[str(c)]), 3)
        print(json.dumps(r), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
