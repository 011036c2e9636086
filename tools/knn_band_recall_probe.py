"""Measure multi-band OR-amplification recall for the kNN edge stage
(VERDICT r13 #3b: upgrade the predicted 1-(1-r)^B curve to a MEASURED
row before sim_knn_graph's r15 registration).

sim_knn_graph's contract (plans/similarity.py, SCALING.md "recall
truth") is a single-probe eps-ball / near-duplicate graph: one
sign-bit band at the production bit width gives ~18% bucket recall
for cosine-0.9 neighbors at the 128k point and ~0 for general top-5
neighbors. The documented general-recall path is multi-band
OR-amplification (the mm_phash 3x20-bit device): B independent bands,
a pair is a candidate if it collides in ANY band. This probe measures
that path directly, per B:

  - eps_recall: fraction of PLANTED cosine-0.9 partner pairs sharing
    at least one band bucket (the eps-ball recall the amplification
    formula predicts as 1-(1-r1)^B from the measured single-band r1);
  - recall_at_5: bucketed-candidate recall of the exact brute-force
    top-5 neighbors over sampled query nodes (the general-ANN meter);
  - cand_per_node: mean exact per-node candidate count, union across
    bands (the cost side: ~Bx the single-band volume at the fixed
    ~us-per-candidate cosine cost the knn_cost_probe row measured);
  - pred_eps_recall: 1-(1-r1)^B computed from THIS run's measured r1,
    so prediction and measurement sit in one JSON line.

Instrument notes (kept honest):
  - nbits comes from the PRODUCTION expression — knn_nbits_case_sql
    evaluated by Spark itself over the real corpus count (the ADVICE
    r13 single-definition rule; no inline reimplementation).
  - Band 0 is the PRODUCTION bucket (signs of the first nbits
    coordinates). Bands b >= 1 are seeded +/-1 random-projection sign
    buckets — for the isotropic synthetic corpus these have the same
    per-bit collision probability P(agree) = 1 - acos(cos)/pi as raw
    coordinate signs, which band 0's measured recall confirms in the
    same output. A production multi-band implementation would ship
    the projection seeds as plan constants exactly like the mm_phash
    band split.
  - The collision/recall arithmetic runs in numpy on the collected
    vectors (128k x 64 floats ~ 32 MB): this is a RECALL meter, not a
    throughput row — the sign test `v > 0` is bit-identical to the
    production fold's `element_at(v, j+1) > 0`, and the exact
    brute-force top-5 uses the same strict-greater ordering with
    ascending-id tie-break as the edge stage's window.

Usage: python tools/knn_band_recall_probe.py [K] [B ...]
       (defaults: K=256 -> 128k vectors, B sweep 1 2 4 8)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from simple_etl_pipeline_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
SEED = 20260816
N_EPS_PAIRS = 512
N_QUERY_NODES = 256
EPS_COSINE = 0.9


def _band_buckets(vecs: np.ndarray, nbits: int, n_bands: int) -> np.ndarray:
    """(n, n_bands) int64 bucket ids. Band 0 = production layout (signs
    of the first nbits raw coordinates); bands >= 1 = seeded +/-1
    random-projection signs."""
    n, dim = vecs.shape
    out = np.empty((n, n_bands), dtype=np.int64)
    bits = (vecs[:, :nbits] > 0).astype(np.int64)
    out[:, 0] = bits @ (1 << np.arange(nbits, dtype=np.int64))
    rng = np.random.default_rng(SEED)
    for b in range(1, n_bands):
        proj = rng.choice((-1.0, 1.0), size=(dim, nbits))
        bits = (vecs @ proj > 0).astype(np.int64)
        out[:, b] = bits @ (1 << np.arange(nbits, dtype=np.int64))
    return out


def main() -> None:
    from tools.scale_probe import write_scaled_embeddings

    from simple_etl_pipeline_spark.plans.similarity import (
        KNN_GRAPH_K,
        KNN_TARGET_BUCKET,
        knn_nbits_case_sql,
    )

    args = [int(a) for a in sys.argv[1:]]
    k = args[0] if args else 256
    bands_sweep = args[1:] or [1, 2, 4, 8]

    spark = get_spark(app_name="knn_band_recall_probe")
    spark.sparkContext.setLogLevel("ERROR")
    out_dir = tempfile.mkdtemp(prefix="knn_band_")
    try:
        write_scaled_embeddings(spark, SF_DIR, k, out_dir)
        rows = (
            spark.read.parquet(os.path.join(out_dir, "embeddings.parquet"))
            .selectExpr("vec_id", "CAST(embedding AS array<double>) AS v")
            .collect()
        )
        # production nbits, evaluated by the production expression
        nbits = spark.sql(
            f"SELECT {knn_nbits_case_sql(KNN_TARGET_BUCKET)} AS nbits"
            f" FROM (SELECT CAST({len(rows)} AS BIGINT) AS _n)"
        ).collect()[0]["nbits"]
    finally:
        shutil.rmtree(out_dir, ignore_errors=True)

    ids = np.array([r.vec_id for r in rows], dtype=np.int64)
    vecs = np.array([r.v for r in rows], dtype=np.float64)
    n, dim = vecs.shape
    norms = np.linalg.norm(vecs, axis=1)
    live = norms > 1e-9

    # plant cosine-EPS partners for a deterministic sample of live rows
    rng = np.random.default_rng(SEED + 1)
    cand_idx = np.flatnonzero(live)
    step = max(1, len(cand_idx) // N_EPS_PAIRS)
    eps_idx = cand_idx[::step][:N_EPS_PAIRS]
    unit = vecs[eps_idx] / norms[eps_idx, None]
    raw = rng.standard_normal((len(eps_idx), dim))
    raw -= (raw * unit).sum(axis=1, keepdims=True) * unit
    raw /= np.linalg.norm(raw, axis=1, keepdims=True)
    partners = EPS_COSINE * unit + np.sqrt(1.0 - EPS_COSINE**2) * raw

    # exact brute-force top-K (production ordering: sim desc, id asc)
    q_idx = cand_idx[:: max(1, len(cand_idx) // N_QUERY_NODES)][
        :N_QUERY_NODES
    ]
    unit_all = np.zeros_like(vecs)
    unit_all[live] = vecs[live] / norms[live, None]
    sims = (vecs[q_idx] / norms[q_idx, None]) @ unit_all.T
    truth: list[set[int]] = []
    for qi, row in zip(q_idx, sims):
        row = row.copy()
        row[qi] = -np.inf
        row[~live] = -np.inf
        order = np.lexsort((ids, -row))
        truth.append(set(ids[order[:KNN_GRAPH_K]]))

    max_b = max(bands_sweep)
    corpus_b = _band_buckets(vecs, nbits, max_b)
    partner_b = _band_buckets(partners, nbits, max_b)
    eps_corpus_b = corpus_b[eps_idx]

    single_band_eps = float(
        np.mean(eps_corpus_b[:, 0] == partner_b[:, 0])
    )
    for n_bands in bands_sweep:
        eps_hit = np.any(
            eps_corpus_b[:, :n_bands] == partner_b[:, :n_bands], axis=1
        )
        # per-node exact candidate union + recall@K over sampled nodes
        buckets: list[dict] = []
        for b in range(n_bands):
            d: dict = {}
            for i, key in enumerate(corpus_b[:, b]):
                d.setdefault(int(key), []).append(i)
            buckets.append(d)
        cand_counts = []
        hits = 0
        total = 0
        for pos, (qi, tset) in enumerate(zip(q_idx, truth)):
            cand: set[int] = set()
            for b in range(n_bands):
                cand.update(buckets[b][int(corpus_b[qi, b])])
            cand.discard(int(qi))
            cand_counts.append(len(cand))
            cand_ids = {int(ids[c]) for c in cand}
            hits += len(tset & cand_ids)
            total += len(tset)
        print(
            json.dumps(
                {
                    "k": k,
                    "n_vectors": int(n),
                    "nbits": int(nbits),
                    "n_bands": n_bands,
                    "eps_cosine": EPS_COSINE,
                    "eps_pairs": int(len(eps_idx)),
                    "eps_recall": round(float(np.mean(eps_hit)), 4),
                    "pred_eps_recall": round(
                        1.0 - (1.0 - single_band_eps) ** n_bands, 4
                    ),
                    "recall_at_5": round(hits / max(total, 1), 4),
                    "cand_per_node": round(
                        float(np.mean(cand_counts)), 1
                    ),
                    "query_nodes": len(q_idx),
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
