"""Data-quality validation at scale: one-pass constraints + free metrics.

Two complementary tools:

- ``check_constraints``: declarative expectations (not-null, unique key,
  value ranges, set membership) evaluated in a SINGLE aggregate pass —
  one scan no matter how many checks, versus the naive one-filter-per-
  check loop that rescans 100 TB per expectation. The Deequ/Great-
  Expectations shape re-expressed as one Spark aggregation.

- ``observe_quality``: piggybacks row/null/violation counters onto an
  EXISTING action via ``pyspark.sql.Observation`` — the metrics are
  collected by the same job that produces the query result, costing
  zero extra scans. This is how a production pipeline meters every
  write it already performs.

No reference equivalent (the reference validates nothing; bad rows are
filtered by pattern, SURVEY §2 F1). Extension surface per §2f.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Observation
from pyspark.sql import functions as F


def not_null(col: str) -> tuple[str, Column]:
    return f"{col}_not_null", F.sum(F.col(col).isNull().cast("bigint"))


def unique(col: str) -> tuple[str, Column]:
    """Violations = rows beyond one per distinct value, NULLs included:
    F.count(col)/countDistinct both skip NULLs, so a key column that is
    half NULL would otherwise sail through the uniqueness check. Count
    all rows, and let all-NULL-but-one count as duplicates too (NULL
    keys are duplicate keys in practice; pair with not_null to report
    them separately)."""
    # coalesce before least: on empty input SUM is NULL and Spark's
    # least() SKIPS nulls (least(NULL,1)=1), which would yield -1.
    n_nulls = F.coalesce(F.sum(F.col(col).isNull().cast("bigint")), F.lit(0))
    distinct_incl_null = F.countDistinct(col) + F.least(n_nulls, F.lit(1))
    return f"{col}_unique", F.count(F.lit(1)) - distinct_incl_null


def in_range(col: str, lo, hi) -> tuple[str, Column]:
    return (
        f"{col}_in_range",
        F.sum((~F.col(col).between(lo, hi)).cast("bigint")),
    )


def in_set(col: str, allowed: list) -> tuple[str, Column]:
    return (
        f"{col}_in_set",
        F.sum((~F.col(col).isin(allowed)).cast("bigint")),
    )


def check_constraints(
    df: DataFrame, checks: list[tuple[str, Column]]
) -> DataFrame:
    """Evaluate all checks in ONE aggregation; returns one row per check:
    (check, n_violations, passed). Null aggregates (empty input) count
    as zero violations."""
    aggs = [
        F.coalesce(expr, F.lit(0)).cast("bigint").alias(name)
        for name, expr in checks
    ]
    wide = df.agg(*aggs)
    stacked = wide.unpivot([], [n for n, _ in checks], "check", "n_violations")
    return stacked.select(
        "check", "n_violations", (F.col("n_violations") == 0).alias("passed")
    )


def observe_quality(
    df: DataFrame, name: str, checks: list[tuple[str, Column]]
) -> tuple[DataFrame, Observation]:
    """Attach violation counters to ``df`` without an extra job: the
    returned Observation is populated when the caller's OWN action runs
    the returned DataFrame. ``obs.get`` maps check name -> violations."""
    obs = Observation(name)
    metrics = [
        F.coalesce(expr, F.lit(0)).cast("bigint").alias(n) for n, expr in checks
    ]
    return df.observe(obs, F.count(F.lit(1)).alias("n_rows"), *metrics), obs
