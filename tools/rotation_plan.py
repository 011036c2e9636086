"""Print the driver-window rotation ledger for the NEXT round.

The correctness gate hashes the 50-slot prefix of queries(); the
repo's rotation invariant (tests/test_driver_window.py) demands every
oracle-backed query appear in the union of the last two recorded
CORRECTNESS windows plus the current _WINDOW. This tool computes what
the NEXT round's mandatory set will be once the current round's
CORRECTNESS file lands (i.e. queries whose coverage will then be two
rounds old), so window rebalancing is a lookup, not an archaeology
session.

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

    # after this round ships, the "last two rounds" will be the newest
    # recorded file plus the current window itself
    latest = set(json.load(open(rounds[-1]))) if rounds else set()
    covered_next = latest | set(window)
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
                "uncovered_now": uncovered_now,
                "next_round_mandatory": len(mandatory_next),
                "next_round_free_slots": 50 - len(mandatory_next),
                "next_round_mandatory_list": mandatory_next,
            },
            indent=1,
        )
    )


if __name__ == "__main__":
    main()
