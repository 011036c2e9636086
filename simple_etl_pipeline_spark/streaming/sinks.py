"""Streaming sinks via foreachBatch: route each micro-batch through the
batch sink layer (reference K1-K4 semantics in a streaming context).

foreachBatch is the streaming fan-out primitive: the micro-batch is a
normal DataFrame, so every batch sink (CSV, JDBC, Sheets, the fan-out
with error isolation) works unchanged — one streaming query can feed
all of them with exactly-once file output per batch id.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery


def stream_to_csv_batches(stream: DataFrame, output_path: str) -> StreamingQuery:
    """Write each micro-batch as out batch_<id>.csv under output_path;
    runs with availableNow (drain-and-stop)."""
    from simple_etl_pipeline_spark.sinks.csv import save_to_csv

    os.makedirs(output_path, exist_ok=True)

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        save_to_csv(batch_df, output_path, filename=f"batch_{batch_id}.csv")

    return (
        stream.writeStream.foreachBatch(write_batch)
        .trigger(availableNow=True)
        .option("checkpointLocation", os.path.join(output_path, "_checkpoint"))
        .start()
    )
