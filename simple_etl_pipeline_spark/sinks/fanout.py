"""Multi-sink fan-out (reference K4, utils/load.py:245-324).

One cached DataFrame routed to any subset of {csv, sheets, postgres}
with per-sink error isolation: a failing sink logs + records its error
and the rest proceed. persist() before the fan-out so each sink action
reuses the computed result instead of re-running the plan (the
reference got this for free by being eager; in Spark it's explicit).
"""

from __future__ import annotations

import logging

from pyspark.sql import DataFrame
from pyspark.storagelevel import StorageLevel

import simple_etl_pipeline_spark.sinks as sinks
from simple_etl_pipeline_spark.sinks.csv import save_to_csv
from simple_etl_pipeline_spark.sinks.jdbc import save_to_postgresql
from simple_etl_pipeline_spark.sinks.sheets import save_to_google_sheets

logger = logging.getLogger(__name__)


def load_data(
    df: DataFrame,
    save_csv: bool = True,
    save_sheets: bool = False,
    save_postgres: bool = False,
    csv_options: dict | None = None,
    sheets_options: dict | None = None,
    postgres_options: dict | None = None,
) -> dict:
    """Returns {'csv': path|None, 'sheets': url|None, 'postgres': bool|None,
    '<sink>_error': str} with per-sink isolation (utils/load.py:282-286)."""
    if not (save_csv or save_sheets or save_postgres):
        raise ValueError("at least one destination must be selected")

    results: dict = {"csv": None, "sheets": None, "postgres": None}
    df.persist(StorageLevel.MEMORY_AND_DISK)
    try:
        if save_csv:
            try:
                results["csv"] = save_to_csv(df, **(csv_options or {}))
            except (sinks.LoadError, Exception) as exc:  # noqa: B014
                logger.error("CSV sink failed: %s", exc)
                results["csv_error"] = str(exc)
        if save_sheets:
            try:
                results["sheets"] = save_to_google_sheets(df, **(sheets_options or {}))
            except Exception as exc:
                logger.error("Sheets sink failed: %s", exc)
                results["sheets_error"] = str(exc)
        if save_postgres:
            try:
                results["postgres"] = save_to_postgresql(df, **(postgres_options or {}))
            except Exception as exc:
                logger.error("PostgreSQL sink failed: %s", exc)
                results["postgres_error"] = str(exc)
    finally:
        df.unpersist()
    return results
