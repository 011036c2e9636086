"""Simulate the driver's correctness gate locally: every queries() entry
vs its oracle_sql() twin at sf0.01 (the driver's SF), ONE shared Spark
session, compare via the same normalize-sort-hash discipline
(testing.compare_with_oracle). Prints one JSON line per query and a
failure summary — run before every round hand-off.

Usage: python tools/driver_sim.py [sf_dir] [first_n]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from simple_etl_pipeline_spark.session import get_spark
from simple_etl_pipeline_spark.testing import compare_with_oracle


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    first_n = int(sys.argv[2]) if len(sys.argv) > 2 else 0
    spark = get_spark(app_name="driver_sim", shuffle_partitions=16)
    spark.sparkContext.setLogLevel("ERROR")
    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    names = list(queries)
    if first_n:
        names = names[:first_n]
    failures = []
    for name in names:
        t0 = time.perf_counter()
        try:
            df = queries[name](spark, sf_dir)
            if name in oracles:
                compare_with_oracle(df, oracles[name], sf_dir)
                status = "hash_ok"
            else:
                n = df.count()
                status = f"rows_only({n})"
        except Exception as exc:  # noqa: BLE001 - report and continue
            status = f"FAIL: {type(exc).__name__}: {exc}"
            failures.append(name)
        print(
            json.dumps(
                {
                    "query": name,
                    "status": status[:400],
                    "wall_s": round(time.perf_counter() - t0, 2),
                }
            ),
            flush=True,
        )
    print(json.dumps({"n": len(names), "failures": failures}))
    spark.stop()
    if failures:
        sys.exit(1)


if __name__ == "__main__":
    main()
