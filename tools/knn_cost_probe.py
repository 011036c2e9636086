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
    - cand_wall_s: warm materialization of the candidate+cosine stage
      ALONE (_knn_candidates_from — no top-K window; one warmup run
      per shape absorbs codegen/shuffle spin-up, the bench.py
      discipline), so us_per_cand = cand_wall_s * 1e6 / n_candidates
      attributes candidate-stage work — cosine plus the hash force
      over candidate rows — to the per-candidate cost (ADVICE r13);
    - wall_s: warm full materialization of the top-K edge output;
      us_per_cand_full divides THIS by candidates — the pre-fix
      figure kept for comparability. The two walls are independent
      materializations (different forced row counts), so neither
      strictly bounds the other.

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
                # the a.vec_id != b.vec_id join). The bucketing is the
                # PRODUCTION stage itself (knn_bucketed consumes the
                # shared knn_nbits_case_sql / KNN_BUCKET_FOLD_SQL
                # definitions — ADVICE r13: no inline copy that could
                # silently diverge from what the edge stage buckets).
                edges_df = simmod._knn_edges_from(corpus)
                hist = (
                    simmod.knn_bucketed(corpus, target)
                    .groupBy("bucket")
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
                # ADVICE r13: time the candidate+cosine stage apart
                # from the per-node top-K window, so us_per_cand
                # attributes candidate-stage work (cosine + the hash
                # force over candidate rows) to the per-candidate
                # cost, instead of also charging the window shuffle.
                # One warmup per shape before timing — the r14 review
                # caught the cold first run paying codegen/shuffle
                # spin-up and inverting the two figures at small K
                # (the bench.py warmup discipline, applied here).
                cand_df = simmod._knn_candidates_from(corpus)
                _force(cand_df)
                t0 = time.time()
                cand_rows = _force(cand_df)
                cand_wall = time.time() - t0
                _force(edges_df)
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
                            "cand_rows": cand_rows,
                            "edge_rows": rows,
                            "cand_wall_s": round(cand_wall, 2),
                            "wall_s": round(wall, 2),
                            "us_per_cand": round(
                                cand_wall * 1e6 / max(cands, 1), 2
                            ),
                            # full edge wall / candidates — the
                            # pre-fix figure, kept for comparability
                            # with the r13 evidence rows. The two
                            # walls are independent materializations
                            # (the edge force touches only K-per-node
                            # rows where the candidate force touches
                            # every candidate), so neither strictly
                            # bounds the other; at probe scale the
                            # full figure includes the window shuffle
                            # the split exists to exclude.
                            "us_per_cand_full": round(
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
