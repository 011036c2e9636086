"""Cross-engine-deterministic aggregation helpers.

Floating-point SUM is order-dependent; Spark and DuckDB will sum
partitions in different orders, so a raw double sum can differ in the
last bits and break a value-hash comparison. The fix: per-row arithmetic
stays in IEEE double (bit-identical in any engine), the *reduction* is
done in DECIMAL(38,6) (exact, associative, order-independent), and the
final value is cast back to double (deterministic nearest-double).

This is also the right call at 100 TB: decimal sums cost a few percent
over double sums but make results reproducible run-to-run regardless of
partitioning — a property production pipelines want anyway.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DECIMAL = "decimal(38,6)"


def dsum(c: Column | str) -> Column:
    """Order-independent sum: exact decimal reduction, double result."""
    c = F.col(c) if isinstance(c, str) else c
    return F.sum(c.cast(DECIMAL)).cast("double")


def davg(c: Column | str) -> Column:
    """Order-independent mean: exact decimal sum / count, double division."""
    c = F.col(c) if isinstance(c, str) else c
    return F.sum(c.cast(DECIMAL)).cast("double") / F.count(F.lit(1))


def sql_dsum(expr: str) -> str:
    """DuckDB twin of :func:`dsum` for oracle SQL."""
    return f"CAST(SUM(CAST(({expr}) AS DECIMAL(38,6))) AS DOUBLE)"


def sql_davg(expr: str) -> str:
    """DuckDB twin of :func:`davg`."""
    return f"(CAST(SUM(CAST(({expr}) AS DECIMAL(38,6))) AS DOUBLE) / COUNT(*))"


def epoch_seconds(c: Column | str) -> Column:
    """Timestamp -> epoch seconds as bigint (sub-second truncated).

    All timestamp-valued query outputs go through this: epoch bigints
    hash identically across engines; timestamp formatting does not.
    DuckDB twin: CAST(floor(epoch(ts)) AS BIGINT).
    """
    c = F.col(c) if isinstance(c, str) else c
    return F.unix_timestamp(c)


def sql_epoch(expr: str) -> str:
    return f"CAST(floor(epoch({expr})) AS BIGINT)"
