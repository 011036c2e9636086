"""Skew-resistant aggregation: explicit two-phase (salted) groupBy.

AQE's skew-join splitting covers joins, but a groupBy on a pathological
hot key (one key holding 30% of 100 TB) still funnels that key's rows to
one reducer in the partial->final plan when the partial aggregation
ratio is poor (e.g. high-cardinality secondary grouping or collect-type
aggs). Salting splits each key into `salt_buckets` subgroups, aggregates
each, then merges — two small shuffles instead of one skewed one.

Decimal-typed sums keep the salted result bit-identical to the unsalted
plan (order-independent reduction), which is what makes this usable as a
drop-in: dedup_salted_agg in plans/relational verifies it against the
plain GROUP BY oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_sum_count(
    df: DataFrame,
    key_cols: list[str],
    value: Column | str,
    salt_buckets: int = 16,
    sum_alias: str = "sum_value",
    count_alias: str = "n_rows",
) -> DataFrame:
    """GROUP BY key_cols computing decimal sum + count, skew-safely.

    Phase 1 groups by (keys, salt) where salt spreads rows of the same
    key across `salt_buckets` reducers; phase 2 merges per-key. The salt
    is derived from a stable hash of a best-effort row identity via
    monotonically_increasing_id — any spread works; correctness never
    depends on the salt value.
    """
    value = F.col(value) if isinstance(value, str) else value
    salted = df.withColumn(
        "__salt", F.pmod(F.monotonically_increasing_id(), F.lit(salt_buckets))
    )
    partial = salted.groupBy(*key_cols, "__salt").agg(
        F.sum(value.cast("decimal(38,6)")).alias("__psum"),
        F.count(F.lit(1)).alias("__pcnt"),
    )
    return partial.groupBy(*key_cols).agg(
        F.sum("__psum").cast("double").alias(sum_alias),
        F.sum("__pcnt").alias(count_alias),
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: list[str],
    salt_buckets: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi-join: salt the big side, replicate the small side.

    AQE skew-join splitting handles most hot keys, but it only fires on
    sort-merge joins over freshly shuffled exchanges — it cannot split
    when the input is already partitioned (bucketed tables, reused
    exchange) or when a hot key's partition exceeds what post-shuffle
    splitting can rebalance. The classic manual remedy: each big-side
    row gets a salt in [0, salt_buckets); the small side is replicated
    once per bucket (an explode over a literal array — no shuffle);
    joining on keys+salt spreads every hot key over `salt_buckets`
    reducers. Cost: small side shuffles salt_buckets× its size — use
    when `small` is 10-100× too big to broadcast and `big` is skewed.

    Only inner/left joins from the big side are semantically safe
    (replication would multiply unmatched small-side rows under
    right/full outer).
    """
    if how not in ("inner", "left", "left_outer", "leftouter"):
        raise ValueError(f"salted_join supports inner/left only, got {how!r}")
    salted_big = big.withColumn(
        "__salt",
        F.pmod(F.monotonically_increasing_id(), F.lit(salt_buckets)).cast("int"),
    )
    replicated_small = small.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(salt_buckets)]))
    )
    return salted_big.join(replicated_small, [*on, "__salt"], how).drop("__salt")
