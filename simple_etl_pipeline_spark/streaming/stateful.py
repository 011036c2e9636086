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
        import itertools
        import math

        import pandas as pd

        (user_id,) = key
        n, s = state.get if state.exists else (0, 0.0)
        # Buffer ALL chunks, then ONE fsum + ONE += per batch: fsum is
        # exactly rounded and order-independent, so the result does not
        # depend on Arrow chunk boundaries — this is what makes the
        # bucketed twin bit-equal (ADVICE r5: per-chunk fsum with +=
        # rounds at every chunk boundary, and boundaries differ between
        # per-key and per-bucket grouping).
        chunks = [pdf["value"].to_numpy() for pdf in pdfs]
        n += sum(len(c) for c in chunks)
        s += math.fsum(itertools.chain.from_iterable(chunks))
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


# --- key-bucketed state: the per-key-overhead amortization --------------
# applyInPandasWithState pays one Python/Arrow round-trip per KEY
# present per micro-batch (measured: exponent 0.95 under a worst-case
# replay where every key recurs every batch — SCALING.md). Bucketing
# users into N_STATE_BUCKETS state groups amortizes that: the runtime
# makes one Python call per BUCKET per batch, and the function fans
# out to its users in pandas. State per bucket is three parallel
# arrays (user, n, sum) — same 16 B/user as the per-key layout, just
# packed; output rows cover only the users touched in the batch, so
# update-mode semantics are preserved exactly.
N_STATE_BUCKETS = 64

BUCKET_STATE_SCHEMA = T.StructType(
    [
        T.StructField("users", T.ArrayType(T.LongType())),
        T.StructField("ns", T.ArrayType(T.LongType())),
        T.StructField("ss", T.ArrayType(T.DoubleType())),
    ]
)


def user_totals_bucketed(
    stream: DataFrame, n_buckets: int = N_STATE_BUCKETS
) -> DataFrame:
    # nested for cloudpickle by-value shipping (see user_totals_stateful)
    def _update_bucket(
        key: tuple, pdfs: Iterator["pd.DataFrame"], state: GroupState
    ) -> Iterator["pd.DataFrame"]:
        import itertools
        import math

        import pandas as pd

        users, ns, ss = state.get if state.exists else ([], [], [])
        users, ns, ss = list(users), list(ns), list(ss)
        idx = {u: i for i, u in enumerate(users)}
        # Buffer each user's values ACROSS chunks, then one fsum + one
        # += per (user, batch) — identical accumulation to the per-key
        # operator regardless of how Arrow chunked either grouping, so
        # the outputs are bit-equal (fsum is exactly rounded and
        # order-independent; only the += boundaries could differ, and
        # now both operators have exactly one per batch).
        buf: dict[int, list] = {}
        for pdf in pdfs:
            for u, g in pdf.groupby("user_id", sort=True):
                buf.setdefault(int(u), []).append(g["value"].to_numpy())
        touched: dict[int, int] = {}
        for u, chunks in buf.items():
            i = idx.get(u)
            if i is None:
                i = len(users)
                idx[u] = i
                users.append(u)
                ns.append(0)
                ss.append(0.0)
            ns[i] += sum(len(c) for c in chunks)
            ss[i] += math.fsum(itertools.chain.from_iterable(chunks))
            touched[u] = i
        state.update((users, ns, ss))
        yield pd.DataFrame(
            {
                "user_id": [users[i] for i in touched.values()],
                "n_events": [ns[i] for i in touched.values()],
                "sum_value": [ss[i] for i in touched.values()],
            }
        )

    keyed = stream.withColumn(
        "bucket", F.pmod(F.col("user_id"), F.lit(n_buckets))
    )
    return keyed.groupBy("bucket").applyInPandasWithState(
        _update_bucket,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=BUCKET_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def st_user_totals_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adapter twin of st_user_totals_stateful over the bucketed-state
    operator — pytest-pinned equal to the per-key variant and to the
    DuckDB oracle (not registered: it exists as the documented scale
    path for the per-key operator's replay cost model)."""
    from simple_etl_pipeline_spark.streaming.events import (
        _run_to_memory,
        read_events_stream,
    )

    stream = read_events_stream(spark, sf_dir)
    out = _run_to_memory(user_totals_bucketed(stream), "update")
    return (
        out.groupBy("user_id")
        .agg(
            F.max("n_events").alias("n_events"),
            F.round(F.max("sum_value"), 4).alias("sum_value"),
        )
        .orderBy("user_id")
    )

SCD2_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("version", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("valid_from", T.LongType()),
        T.StructField("valid_to", T.LongType()),
    ]
)
SCD2_STATE_SCHEMA = T.StructType(
    [
        T.StructField("cur_type", T.StringType()),
        T.StructField("version", T.LongType()),
        T.StructField("run_start", T.LongType()),
        T.StructField("run_n", T.LongType()),
    ]
)


def scd2_stateful(stream: DataFrame) -> DataFrame:
    """Streaming SCD Type-2: per-user state holds the OPEN dimension row
    (current event_type, its version number, start epoch, event count);
    each attribute change CLOSES the previous interval and emits it.
    This is the streaming twin of plans/events.ev_scd2_users — a CDC
    feed maintaining a dimension table incrementally instead of
    recompacting history per batch.

    Emission is deterministic because only CLOSED intervals are ever
    output (exactly once, when the change arrives); the open run lives
    in state and is never emitted, so micro-batch BOUNDARIES cannot
    change the result — the query equals the batch build minus its
    is_current rows. That equivalence additionally requires micro-batch
    ORDER to respect event time across batches (within a batch the
    operator sorts by ts, event_id itself): the state machine applies
    changes as they arrive and, like every SCD2 CDC consumer, cannot
    retroactively reopen a closed interval for a late event. The
    single-file replay and a production date-partitioned backfill both
    satisfy that; an unordered multi-file directory replayed
    file-at-a-time does NOT — which is why the st_scd2_users adapter
    drains the replay in ONE availableNow batch (one_batch=True), making
    the in-batch sort global over any layout. State per key is ~40 bytes: at
    100 TB/day the store holds |users| entries, independent of stream
    length."""

    def _update_scd2(
        key: tuple, pdfs: Iterator["pd.DataFrame"], state: GroupState
    ) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        (user_id,) = key
        cur_type, version, run_start, run_n = (
            state.get if state.exists else (None, 0, 0, 0)
        )
        batch = pd.concat(list(pdfs), ignore_index=True)
        # arrival order within a micro-batch is shuffle order; the
        # operator's contract is event-time order with event_id ties
        batch = batch.sort_values(["ts", "event_id"], kind="mergesort")
        out = {k: [] for k in ("version", "event_type", "n_events",
                               "valid_from", "valid_to")}
        for ts, etype in zip(batch["ts"], batch["event_type"]):
            ep = ts.value // 1_000_000_000  # floor(epoch), pandas nanos
            if cur_type is None:
                cur_type, version, run_start, run_n = etype, 1, ep, 1
            elif etype != cur_type:
                out["version"].append(version)
                out["event_type"].append(cur_type)
                out["n_events"].append(run_n)
                out["valid_from"].append(run_start)
                out["valid_to"].append(ep)
                cur_type, version, run_start, run_n = (
                    etype, version + 1, ep, 1,
                )
            else:
                run_n += 1
        state.update((cur_type, version, run_start, run_n))
        yield pd.DataFrame(
            {
                "user_id": [user_id] * len(out["version"]),
                "version": out["version"],
                "event_type": out["event_type"],
                "n_events": out["n_events"],
                "valid_from": out["valid_from"],
                "valid_to": out["valid_to"],
            }
        )

    return stream.groupBy("user_id").applyInPandasWithState(
        _update_scd2,
        outputStructType=SCD2_OUTPUT_SCHEMA,
        stateStructType=SCD2_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def st_scd2_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """queries() adapter: the emitted rows are exactly the batch SCD2
    build's closed intervals (EV_SCD2_ORACLE filtered to
    valid_to IS NOT NULL), so the oracle is shared with the batch twin."""
    from simple_etl_pipeline_spark.streaming.events import (
        _run_to_memory,
        read_events_stream,
    )

    # one_batch: SCD2's contract needs event-time order ACROSS files
    # (see scd2_stateful's docstring); a whole-replay batch makes the
    # in-batch sort global, so the build is correct on ANY file layout
    # — and it removes the per-key-per-batch Python invocation cost
    # the streaming scale probe measured under 1-file triggers
    # (81 s -> ~linear at K=64). A single-file dir (the driver's
    # testdata) is one batch either way.
    stream = read_events_stream(spark, sf_dir, one_batch=True)
    out = _run_to_memory(scd2_stateful(stream), "append")
    return out.orderBy("user_id", "version")


ST_SCD2_ORACLE = """
WITH flagged AS (
  SELECT user_id, ts, event_type, event_id,
    CASE WHEN LAG(event_type) OVER w IS NULL
           OR event_type <> LAG(event_type) OVER w
         THEN 1 ELSE 0 END AS changed
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), runs AS (
  SELECT *, CAST(SUM(changed) OVER (
    PARTITION BY user_id ORDER BY ts, event_id
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS version
  FROM flagged
), intervals AS (
  SELECT user_id, version, MIN(event_type) AS event_type,
    COUNT(*) AS n_events,
    CAST(floor(epoch(MIN(ts))) AS BIGINT) AS valid_from
  FROM runs GROUP BY user_id, version
), stitched AS (
  SELECT user_id, version, event_type, n_events, valid_from,
    LEAD(valid_from) OVER (PARTITION BY user_id ORDER BY version) AS valid_to
  FROM intervals
)
SELECT * FROM stitched WHERE valid_to IS NOT NULL
ORDER BY user_id, version
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
            import itertools
            import math

            import pandas as pd

            (user_id,) = key
            prev = self._state.get() if self._state.exists() else None
            n, s = prev if prev is not None else (0, 0.0)
            # one fsum + one += per batch, chunk-boundary-independent
            # (same accumulation contract as user_totals_stateful)
            chunks = [pdf["value"].to_numpy() for pdf in rows]
            n += sum(len(c) for c in chunks)
            s += math.fsum(itertools.chain.from_iterable(chunks))
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
TAIL_QUERIES: dict[str, Any] = {"st_scd2_users": st_scd2_users}
TAIL_ORACLES = {"st_scd2_users": ST_SCD2_ORACLE}
if tws_available():  # see tws_available docstring — env-gated feature
    QUERIES["st_user_totals_tws"] = st_user_totals_tws
    ORACLES["st_user_totals_tws"] = ST_USER_TOTALS_ORACLE
