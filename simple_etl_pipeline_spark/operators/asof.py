"""As-of join: for each left row, the latest right row with
right_ts <= left_ts per key — an operator Spark lacks natively
(DuckDB/Pandas have ASOF JOIN; kdb calls it aj).

Implementation is the scalable union-and-carry form, NOT a range join:
tag both sides, union, sort within key by (ts, side), and carry the
last non-null right payload forward with last(ignorenulls) over an
unbounded-preceding window. Cost: one shuffle + sort on the key —
identical to a single window function, with no row-multiplication and
no ts-range explosion. Works at any key cardinality / time density.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    payload: dict[str, str],
    right_tiebreak: str | None = None,
) -> DataFrame:
    """Left rows + latest-prior right payload.

    payload maps right column -> output column name. Ties where
    right_ts == left_ts match (ASOF >= semantics). right_tiebreak
    orders equal-timestamp right rows deterministically (latest wins).
    """
    out_cols = list(payload.values())
    r = right.select(
        F.col(on).alias("__k"),
        F.col(right_ts).alias("__t"),
        F.lit(0).alias("__side"),
        *[F.col(src).alias(f"__p_{dst}") for src, dst in payload.items()],
        (
            F.col(right_tiebreak) if right_tiebreak else F.lit(0)
        ).alias("__tie"),
    )
    l = left.select(
        "*",
        F.col(on).alias("__k"),
        F.col(left_ts).alias("__t"),
        F.lit(1).alias("__side"),
        F.lit(0).alias("__tie"),
    )
    u = l.unionByName(r, allowMissingColumns=True)

    # Right rows sort before left rows at equal ts (side 0 < 1), so an
    # exactly-simultaneous right row is visible to the left row.
    w = (
        Window.partitionBy("__k")
        .orderBy("__t", "__side", "__tie")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = u.select(
        "*",
        *[
            F.last(f"__p_{dst}", ignorenulls=True).over(w).alias(dst)
            for dst in out_cols
        ],
    )
    return carried.filter(F.col("__side") == 1).drop(
        "__k", "__t", "__side", "__tie", *[f"__p_{d}" for d in out_cols]
    )
