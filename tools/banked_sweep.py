"""Evidence-hygiene sweep for the prebuild bank: run every name in
__spark_entry__._BANKED_PREBUILDS against its DuckDB oracle at sf0.1
(or $SPARK_GRAFT_SF_DIR) and print one line per op with wall time.

This codifies the ad-hoc "banked sf0.1 hash sweep" the registration
gate has required since round 9: if ANY file a banked op lives in (or
a shared helper it consumes) changes between its build commit and its
registration round, the sweep re-runs on the changed code and the
result is recorded in SCALING.md. Exit is nonzero on any mismatch, so
the round-open workflow can gate on it.

The oracle map below is explicit (banked ops are deliberately NOT in
the registry dicts — that's what makes them banked), and
test_banked_prebuilds_list_is_consistent + the _resolve() failure path
keep it honest: a banked name missing here fails loudly, not silently.

Usage: python tools/banked_sweep.py [name ...]   (default: all banked)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _resolve(name: str):
    """(callable, oracle_sql) for a banked prebuild."""
    from simple_etl_pipeline_spark.plans import events as ev
    from simple_etl_pipeline_spark.plans import multimodal as mm
    from simple_etl_pipeline_spark.plans import relational as rel
    from simple_etl_pipeline_spark.plans import similarity as sim
    from simple_etl_pipeline_spark.plans import text as txt
    from simple_etl_pipeline_spark.streaming import events as st_ev
    from simple_etl_pipeline_spark.streaming import stateful as st_state

    table = {
        # r13 bank
        "train_attention_pack": (
            txt.train_attention_pack, txt.TRAIN_ATTENTION_PACK_ORACLE,
        ),
        "dq_embedding_drift": (
            sim.dq_embedding_drift, sim.DQ_EMBEDDING_DRIFT_ORACLE,
        ),
        "st_dedup_lsh_index": (
            st_state.st_dedup_lsh_index, st_state.ST_DEDUP_LSH_ORACLE,
        ),
        # r14 bank
        "train_binpack_shelves": (
            txt.train_binpack_shelves, txt.TRAIN_BINPACK_SHELVES_ORACLE,
        ),
        "dq_snapshot_diff": (
            rel.dq_snapshot_diff, rel.DQ_SNAPSHOT_DIFF_ORACLE,
        ),
        "st_embedding_drift": (
            # the streaming twin SHARES the batch monitor's oracle
            st_ev.st_embedding_drift, sim.DQ_EMBEDDING_DRIFT_ORACLE,
        ),
        # r15 bank
        "ev_mad_outliers": (
            ev.ev_mad_outliers, ev.EV_MAD_OUTLIERS_ORACLE,
        ),
        "sim_knn_graph": (sim.sim_knn_graph, sim.SIM_KNN_GRAPH_ORACLE),
        "mm_bytes_shard_pack": (
            mm.mm_bytes_shard_pack, mm.MM_BYTES_SHARD_PACK_ORACLE,
        ),
        # r16 bank
        "sim_knn_components": (
            sim.sim_knn_components, sim.SIM_KNN_COMPONENTS_ORACLE,
        ),
        "train_eval_decontam_report": (
            txt.train_eval_decontam_report,
            txt.TRAIN_EVAL_DECONTAM_ORACLE,
        ),
        "ev_changepoint_cusum": (
            ev.ev_changepoint_cusum, ev.EV_CHANGEPOINT_CUSUM_ORACLE,
        ),
    }
    if name not in table:
        raise KeyError(
            f"banked prebuild {name!r} has no sweep entry — add its "
            "(callable, oracle) pair to tools/banked_sweep.py in the "
            "build commit"
        )
    return table[name]


def main() -> None:
    from simple_etl_pipeline_spark.session import get_spark
    from simple_etl_pipeline_spark.testing import compare_with_oracle

    names = sys.argv[1:] or list(entrymod._BANKED_PREBUILDS)
    spark = get_spark(app_name="banked_sweep")
    spark.sparkContext.setLogLevel("ERROR")
    failures = 0
    for name in names:
        fn, sql = _resolve(name)
        t0 = time.time()
        try:
            compare_with_oracle(fn(spark, SF_DIR), sql, SF_DIR)
            print(f"{name}: hash_ok {SF_DIR} in {time.time() - t0:.1f}s")
        except Exception as exc:  # noqa: BLE001 — reported, gate fails
            failures += 1
            print(f"{name}: MISMATCH — {exc}", file=sys.stderr)
    if failures:
        sys.exit(1)


if __name__ == "__main__":
    main()
