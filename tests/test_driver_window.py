"""Driver hard-check window accounting.

The driver's correctness gate hashes a 50-slot prefix of queries() in
registration order (observed in rounds 1 and 2). These invariants keep
the window composition deliberate: every slot oracle-backed (no wasted
no_oracle rows), no dupes, and the explicit _WINDOW list actually being
the prefix the driver will see.
"""

from __future__ import annotations

import __spark_entry__ as entrymod


def test_window_is_exactly_fifty():
    assert len(entrymod._WINDOW) == 50
    assert len(set(entrymod._WINDOW)) == 50


def test_window_is_the_registration_prefix():
    names = list(entrymod.queries())
    assert names[:50] == entrymod._WINDOW


def test_every_window_slot_is_oracle_backed():
    oracles = entrymod.oracle_sql()
    missing = [n for n in entrymod._WINDOW if n not in oracles]
    assert missing == []


def test_registry_totals():
    q = entrymod.queries()
    o = entrymod.oracle_sql()
    assert len(q) >= 140
    # 100% oracle-backed: dedup_minhash_ml (Spark-internal hash seeds,
    # permanently oracle-dark) was demoted to a pytest-only comparison
    # in round 5 (tests/test_retrieval.py).
    assert set(q) - set(o) == set()


def test_banked_prebuilds_list_is_consistent():
    """_BANKED_PREBUILDS feeds the rotation test's pending-state
    allowlist, so it must stay honest: a banked name must NOT be
    registered (a registered name left in the list could skip
    scheduling forever — the exact crack the allowlist closes), and
    every entry must resolve to a real operator in the plans modules
    (a typo would silently fail to allowlist the real prebuild)."""
    from simple_etl_pipeline_spark.plans import (
        events as _ev,
        multimodal as _mm,
        relational as _rel,
        similarity as _sim,
        text as _txt,
    )
    from simple_etl_pipeline_spark.streaming import (
        events as _st_ev,
        stateful as _st_state,
    )

    banked = list(entrymod._BANKED_PREBUILDS)
    assert len(banked) == len(set(banked))
    registered = set(entrymod.queries())
    assert set(banked) & registered == set(), (
        "banked names are unregistered by definition; registering one "
        "must remove it from _BANKED_PREBUILDS in the same commit"
    )
    # streaming modules joined the resolution set in round 12 when the
    # r13 bank added the first streaming prebuild (st_dedup_lsh_index)
    for name in banked:
        assert any(
            callable(getattr(mod, name, None))
            for mod in (_ev, _rel, _sim, _txt, _mm, _st_ev, _st_state)
        ), f"banked prebuild {name} resolves to no operator"


def test_rotation_invariant_no_query_waits_three_rounds():
    """Every oracle-backed query must appear in the union of the LAST
    TWO recorded driver windows (CORRECTNESS_r{N}.json keys) plus the
    current _WINDOW — i.e. no registered query goes more than two
    rounds without a scheduled driver row. This is the crack
    agg_mode_source_by_lang fell through in round 3: registered in the
    final commit, absent from every window.

    Two states (VERDICT r7 ask #8 — rounds 4-7 shipped this test RED
    at hand-off by design; now the state is recognized instead):

    - ROTATION PENDING (the newest recorded file IS the current
      _WINDOW: the driver has run this window's gate and the next
      round has not rebalanced yet): the forward invariant is
      *expected* to need the next rebalance. The test then checks the
      invariant HELD at the recorded gate (window plus the two
      recordings before it covered the registry) and stays green;
      round-open enforcement lives in tools/rotation_plan.py, which
      exits nonzero in this state until the window is rebalanced.
    - ACTIVE WINDOW (rebalanced, not yet recorded): strict forward
      check — a failure means the window needs re-balancing before
      the round ships."""
    import glob
    import json
    import os
    import re

    root = os.path.dirname(os.path.abspath(entrymod.__file__))
    rounds = sorted(
        glob.glob(os.path.join(root, "CORRECTNESS_r*.json")),
        key=lambda p: int(re.search(r"r(\d+)", os.path.basename(p)).group(1)),
    )
    oracle = set(entrymod.oracle_sql())
    window = set(entrymod._WINDOW)

    latest = set(json.load(open(rounds[-1]))) if rounds else set()
    if rounds and latest == window:
        # rotation pending: assert the invariant held AT the recorded
        # gate — covered by that window plus the two recordings before
        # it. (Queries registered after the gate are the next round's
        # registrations; they cannot retroactively have had a slot.)
        covered = set(window)
        for path in rounds[-3:-1]:
            covered |= set(json.load(open(path)))
        # restrict to queries that already existed at the gate: a
        # registry member absent from EVERY recording and the window
        # is new since the gate.
        recorded_ever = set()
        for path in rounds:
            recorded_ever |= set(json.load(open(path)))
        uncovered = sorted((oracle & recorded_ever) - covered)
        assert uncovered == [], (
            f"rotation-pending state, but the recorded gate itself "
            f"violated the invariant: {uncovered}"
        )
        # ADVICE r8 (low): the restriction to recorded_ever would let a
        # query that was registered but NEVER scheduled — the exact
        # agg_mode_source_by_lang crack — pass silently while the
        # window equals the latest recording. Close it: in the pending
        # state NO registered query may be absent from every recording
        # and the window. (The original fix allowlisted
        # _BANKED_PREBUILDS here, but test_banked_prebuilds_list_is_
        # consistent now forbids a name being banked AND registered —
        # registration moves the name out of the bank in the same
        # commit as the rebalance, which also flips the state to
        # active — so the subtraction was dead and this is the
        # strictly stronger form: registering without rebalancing
        # fails immediately.)
        orphans = sorted(oracle - recorded_ever - window)
        assert orphans == [], (
            f"registered queries never scheduled in ANY window: "
            f"{orphans} (register + rebalance in the same commit)"
        )
        return
    covered = set(window)
    for path in rounds[-2:]:
        covered |= set(json.load(open(path)))
    uncovered = sorted(oracle - covered)
    assert uncovered == [], (
        f"queries with no driver slot in the last two rounds nor the "
        f"current window: {uncovered}"
    )


def test_every_banked_prebuild_has_a_sweep_entry():
    """tools/banked_sweep.py is the registration gate's executable
    form: a banked name missing from its resolve table would silently
    fall out of the sf0.1 evidence sweep, so the table must cover the
    bank exactly as it stands in every commit."""
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "banked_sweep",
        os.path.join(
            os.path.dirname(os.path.abspath(entrymod.__file__)),
            "tools",
            "banked_sweep.py",
        ),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    for name in entrymod._BANKED_PREBUILDS:
        fn, sql = mod._resolve(name)
        assert callable(fn) and isinstance(sql, str) and sql.strip()


def test_banked_sweep_negative_control(spark):
    """The sweep's comparison path must be able to FAIL (VERDICT r12
    #6 — the FP_RESIDUAL discipline applied to the one instrument not
    yet negative-controlled): a deliberately-wrong banked result fed
    through the exact compare_with_oracle call tools/banked_sweep.py
    makes must raise, on each divergence class the driver's gate
    hashes — a value perturbation, a dropped row, and a renamed
    column. If any of these passes silently, every 'hash_ok' line the
    sweep ever printed is meaningless."""
    import pytest
    from pyspark.sql import functions as F

    from simple_etl_pipeline_spark.plans.events import (
        EV_CHANGEPOINT_CUSUM_ORACLE,
        ev_changepoint_cusum,
    )
    from simple_etl_pipeline_spark.testing import compare_with_oracle

    sf = "/root/testdata/sf0.001"
    good = ev_changepoint_cusum(spark, sf)
    # control arm: the genuine result passes (so the failures below
    # are attributable to the mutations, not the fixture)
    compare_with_oracle(good, EV_CHANGEPOINT_CUSUM_ORACLE, sf)
    wrong_value = ev_changepoint_cusum(spark, sf).withColumn(
        "n_events", F.col("n_events") + F.lit(1)
    )
    with pytest.raises(AssertionError):
        compare_with_oracle(wrong_value, EV_CHANGEPOINT_CUSUM_ORACLE, sf)
    n = good.count()
    dropped_row = ev_changepoint_cusum(spark, sf).limit(n - 1)
    with pytest.raises(AssertionError):
        compare_with_oracle(dropped_row, EV_CHANGEPOINT_CUSUM_ORACLE, sf)
    renamed = ev_changepoint_cusum(spark, sf).withColumnRenamed(
        "n_events", "n_event"
    )
    with pytest.raises(AssertionError):
        compare_with_oracle(renamed, EV_CHANGEPOINT_CUSUM_ORACLE, sf)
