"""End-to-end E→T→L orchestrator (reference O1, main.py:26-109).

extract (scrape ingest) -> guard empty -> transform -> guard empty ->
fan-out load with per-sink error isolation -> log results, preview,
boolean success. The Spark version differs where it should: extraction
parses in executors, transform is one lazy codegen stage, and the
preview is show()/printSchema() instead of head()/info().

Run: python -m simple_etl_pipeline_spark.pipeline <pages_dir> <output_dir>
"""

from __future__ import annotations

import logging
import sys

from pyspark.sql import SparkSession

from simple_etl_pipeline_spark.operators.transform import transform_data
from simple_etl_pipeline_spark.sinks.fanout import load_data
from simple_etl_pipeline_spark.sources.scrape import ingest_html_files

logger = logging.getLogger(__name__)


def run_pipeline(
    spark: SparkSession,
    pages_path: str,
    output_path: str,
    save_sheets: bool = False,
    save_postgres: bool = False,
    sheets_options: dict | None = None,
    postgres_options: dict | None = None,
    run_timestamp: str = "1970-01-01T00:00:00",
    preview: bool = True,
) -> bool:
    """Returns True iff at least one sink succeeded (reference contract:
    exit code from main(), main.py:112-114)."""
    logger.info("extracting from %s", pages_path)
    raw = ingest_html_files(spark, pages_path, run_timestamp=run_timestamp)
    if raw.isEmpty():
        logger.error("extraction produced no rows; aborting (main.py:32-34)")
        return False

    clean = transform_data(raw)
    if clean.isEmpty():
        logger.error("transform produced no rows; aborting (main.py:40-42)")
        return False

    results = load_data(
        clean,
        save_csv=True,
        save_sheets=save_sheets,
        save_postgres=save_postgres,
        csv_options={"output_path": output_path},
        sheets_options=sheets_options,
        postgres_options=postgres_options,
    )
    for sink in ("csv", "sheets", "postgres"):
        err = results.get(f"{sink}_error")
        if err:
            logger.error("%s sink failed: %s", sink, err)
        elif results.get(sink) is not None:
            logger.info("%s sink ok: %s", sink, results[sink])

    if preview:
        clean.show(5, truncate=False)
        clean.printSchema()
    return any(
        results.get(s) is not None and f"{s}_error" not in results
        for s in ("csv", "sheets", "postgres")
    )


def main(argv: list[str]) -> int:
    logging.basicConfig(
        level=logging.INFO,
        format="%(asctime)s - %(name)s - %(levelname)s - %(message)s",
    )
    if len(argv) != 2:
        print("usage: python -m simple_etl_pipeline_spark.pipeline <pages_dir> <output_dir>")
        return 2
    from simple_etl_pipeline_spark.session import get_spark

    spark = get_spark(app_name="etl-pipeline")
    ok = run_pipeline(spark, argv[0], argv[1])
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
