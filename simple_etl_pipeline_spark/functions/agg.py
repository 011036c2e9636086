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


# --- cross-engine FLOOR division --------------------------------------
#
# Integer division truncates toward zero in BOTH engines (verified:
# `SELECT -90000 // 86400` is -1 in DuckDB and `-90000 div 86400` is
# -1 in Spark), so bare integer division is NOT floor division for
# negative numerators — a pre-1970 timestamp bucketed with a bare
# `div`/`//` lands one bucket high on BOTH sides, or on ONE side if
# the idiom is applied asymmetrically (the round-9 agg_ols_trend
# oracle bug, ADVICE r9: the Spark side floored via pmod while the
# oracle kept the bare `//`). The floor idiom subtracts the
# NON-NEGATIVE remainder first, making the numerator an exact multiple
# of the divisor — where truncation and floor agree. These four
# helpers are the ONLY sanctioned spelling: every floor-division in an
# operator must use floor_div/floor_div_expr on the Spark side and
# sql_floor_div on the oracle side, so floor semantics can never again
# be applied to only one engine.


def floor_div_expr(expr: str, divisor: int) -> str:
    """Spark SQL expression string: FLOOR division of an integer
    expression by a positive integer constant. `expr` is interpolated
    twice — it must be a pure, cheap expression (a column reference or
    simple arithmetic)."""
    if divisor <= 0:
        raise ValueError(f"divisor must be positive, got {divisor}")
    return f"(({expr}) - pmod(({expr}), {divisor})) div {divisor}"


def floor_div(expr: str, divisor: int) -> Column:
    """Column form of :func:`floor_div_expr`."""
    return F.expr(floor_div_expr(expr, divisor))


def sql_pmod(expr: str, divisor: int) -> str:
    """DuckDB twin of Spark's pmod(): the non-negative remainder.
    DuckDB's `%` follows the dividend's sign (-7 % 2 = -1), so the
    classic ((e % d) + d) % d normalization is required."""
    if divisor <= 0:
        raise ValueError(f"divisor must be positive, got {divisor}")
    return f"((({expr}) % {divisor}) + {divisor}) % {divisor}"


def sql_floor_div(expr: str, divisor: int) -> str:
    """DuckDB twin of :func:`floor_div_expr`. Same purity requirement
    on `expr` (interpolated more than once)."""
    if divisor <= 0:
        raise ValueError(f"divisor must be positive, got {divisor}")
    return f"((({expr}) - ({sql_pmod(expr, divisor)})) // {divisor})"
