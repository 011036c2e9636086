"""Per-candidate cost + KNN_TARGET_BUCKET sensitivity for the shared
kNN edge stage (VERDICT r12 #4: make sim_knn_graph's production-cosine
story a MEASURED row before its r15 registration).

What it measures, at a fixed scaled corpus (default the sim probe's
K=256 point, ~512k vectors after dup injection is irrelevant here —
the edge stage runs on the raw corpus):

  for KNN_TARGET_BUCKET in the sweep list:
    - n_candidates: exact candidate-pair volume of the bucket-keyed
      equi-self-join (sum over buckets of n*(n-1)) — computed WITHOUT
      evaluating the cosine, so it times nothing it shouldn't;
    - wall_s: full materialization of the top-K edge output (the
      scale_probe _force action: xxhash64 every column, bit_xor fold);
    - us_per_cand: wall_s * 1e6 / n_candidates — the interpreted
      CodegenFallback HOF cosine dominates this, so the row IS the
      per-candidate cost the SCALING.md watch-item cites (~14 µs).

The sweep demonstrates the bounded-work knob: candidate volume (and
therefore wall) scales ~1/TARGET while the auto-bits expression keeps
expected bucket width ~TARGET at any corpus size — halving the target
halves the per-node candidate work, trading recall exactly like the
SemDeDup K knob. Measurement-only: no plan body changes, so banked
evidence stays valid.

Usage: python tools/knn_cost_probe.py [K] [target ...]
       (defaults: K=256, targets 16 64 256)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from simple_etl_pipeline_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def main() -> None:
    from tools.scale_probe import _force, write_scaled_embeddings

    from simple_etl_pipeline_spark.plans import similarity as simmod
    from simple_etl_pipeline_spark.schemas import load_table

    args = [int(a) for a in sys.argv[1:]]
    k = args[0] if args else 256
    targets = args[1:] or [16, 64, 256]

    spark = get_spark(app_name="knn_cost_probe")
    spark.sparkContext.setLogLevel("ERROR")
    out_dir = tempfile.mkdtemp(prefix="knn_cost_")
    try:
        write_scaled_embeddings(spark, SF_DIR, k, out_dir)
        corpus = (
            load_table(spark, out_dir, "embeddings")
            .selectExpr(
                "vec_id", "CAST(embedding AS array<double>) AS v"
            )
        )
        n = corpus.count()
        default = simmod.KNN_TARGET_BUCKET
        for target in targets:
            simmod.KNN_TARGET_BUCKET = target
            try:
                # candidate volume WITHOUT cosine evaluation: bucket
                # histogram -> sum n*(n-1) (ordered pairs, matching
                # the a.vec_id != b.vec_id join)
                edges_df = simmod._knn_edges_from(corpus)
                bucketed = corpus.crossJoin(
                    F.broadcast(
                        corpus.agg(
                            F.count(F.lit(1)).alias("_n")
                        ).select(
                            F.expr(
                                f"CASE WHEN ((_n + {target - 1})"
                                f" div {target}) <= 1"
                                f" THEN {simmod.LSH_BITS}"
                                " ELSE least(greatest("
                                f"{simmod.LSH_BITS},"
                                f" length(bin((_n + {target - 1})"
                                f" div {target} - 1))), 32) END"
                            ).alias("nbits")
                        )
                    )
                ).withColumn(
                    "bucket",
                    F.expr(
                        "aggregate(sequence(0, nbits - 1),"
                        " CAST(0 AS BIGINT), (acc, j) -> acc +"
                        " CASE WHEN element_at(v, j + 1) > 0"
                        " THEN CAST(shiftleft(CAST(1 AS BIGINT), j)"
                        " AS BIGINT) ELSE CAST(0 AS BIGINT) END)"
                    ),
                )
                hist = (
                    bucketed.groupBy("bucket")
                    .agg(F.count(F.lit(1)).alias("bn"))
                    .agg(
                        F.sum(
                            F.col("bn") * (F.col("bn") - F.lit(1))
                        ).alias("cands"),
                        F.max("bn").alias("max_bucket"),
                        F.count(F.lit(1)).alias("n_buckets"),
                    )
                    .collect()[0]
                )
                t0 = time.time()
                rows = _force(edges_df)
                wall = time.time() - t0
                cands = int(hist["cands"])
                print(
                    json.dumps(
                        {
                            "k": k,
                            "n_vectors": n,
                            "target_bucket": target,
                            "n_buckets": int(hist["n_buckets"]),
                            "max_bucket": int(hist["max_bucket"]),
                            "n_candidates": cands,
                            "edge_rows": rows,
                            "wall_s": round(wall, 2),
                            "us_per_cand": round(
                                wall * 1e6 / max(cands, 1), 2
                            ),
                        }
                    ),
                    flush=True,
                )
            finally:
                simmod.KNN_TARGET_BUCKET = default
    finally:
        shutil.rmtree(out_dir, ignore_errors=True)


if __name__ == "__main__":
    main()
