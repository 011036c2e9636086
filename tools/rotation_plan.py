"""Print the driver-window rotation ledger for the NEXT round.

The correctness gate hashes the 50-slot prefix of queries(); the
repo's rotation invariant (tests/test_driver_window.py) demands every
oracle-backed query appear in the union of the last two recorded
CORRECTNESS windows plus the current _WINDOW. This tool computes what
the NEXT round's mandatory set will be, so window rebalancing is a
lookup, not an archaeology session.

Timing-robust (VERDICT r6 ask #5): the arithmetic depends on whether
the driver has already recorded the current _WINDOW. The two states
are distinguished by comparing _WINDOW with the newest CORRECTNESS
file's keys:

- PRE-REBALANCE (round open: the newest file IS the current window,
  i.e. the driver recorded it at the last gate and the builder has
  not rebalanced yet): the set the REBALANCED window must contain is
  oracle - union(last two recorded files) — exactly the test's
  rounds[-2:] term, with the new window the unknown being solved.
- POST-REBALANCE (round close: _WINDOW differs from the newest file,
  i.e. it is the upcoming gate's window): at the gate after next, the
  last two recorded files will be the newest file plus what _WINDOW
  becomes, so the round-after-next mandatory set is
  oracle - (newest file | _WINDOW).

Usage: python tools/rotation_plan.py
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod


def main() -> None:
    root = os.path.dirname(os.path.abspath(entrymod.__file__))
    rounds = sorted(
        glob.glob(os.path.join(root, "CORRECTNESS_r*.json")),
        key=lambda p: int(re.search(r"r(\d+)", os.path.basename(p)).group(1)),
    )
    oracle = set(entrymod.oracle_sql())
    window = list(entrymod._WINDOW)

    latest = set(json.load(open(rounds[-1]))) if rounds else set()
    rebalanced = bool(rounds) and set(window) != latest
    if rebalanced:
        # _WINDOW is the upcoming gate's window; it will become the
        # newest recorded file, shifting `latest` into second place.
        covered_next = latest | set(window)
    else:
        # _WINDOW was already recorded as rounds[-1]; the set the
        # REBALANCED window must contain comes from the last two
        # recorded files alone (the test's rounds[-2:] term).
        covered_next = set()
        for path in rounds[-2:]:
            covered_next |= set(json.load(open(path)))
    mandatory_next = sorted(oracle - covered_next)

    # sanity: the CURRENT invariant (what the test enforces today)
    covered_now = set(window)
    for path in rounds[-2:]:
        covered_now |= set(json.load(open(path)))
    uncovered_now = sorted(oracle - covered_now)

    print(
        json.dumps(
            {
                "registered": len(entrymod.queries()),
                "oracle_backed": len(oracle),
                "window": len(window),
                "state": "post_rebalance" if rebalanced else "pre_rebalance",
                "uncovered_now": uncovered_now,
                "next_round_mandatory": len(mandatory_next),
                "next_round_free_slots": 50 - len(mandatory_next),
                "next_round_mandatory_list": mandatory_next,
            },
            indent=1,
        )
    )
    # Enforcement at round open (VERDICT r7 ask #8): in the
    # pre-rebalance state this tool — which the round-open workflow
    # runs FIRST — exits nonzero until the window is rebalanced to the
    # printed mandatory list. The pytest rotation test stays green
    # across hand-off (it recognizes the recorded-window state) and
    # strict the moment a rebalanced window is in place, so "pytest
    # green" is literally true at round end without weakening the
    # invariant.
    if not rebalanced and mandatory_next:
        missing = sorted(set(mandatory_next) - set(window))
        if missing:
            print(
                f"PRE-REBALANCE: {len(missing)} mandatory queries not yet "
                "in _WINDOW — rebalance before building.",
                file=sys.stderr,
            )
            sys.exit(1)


if __name__ == "__main__":
    main()
