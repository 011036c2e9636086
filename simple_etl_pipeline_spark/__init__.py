"""simple_etl_pipeline_spark — a PySpark-native analytics engine.

Re-expresses the full capability surface of the reference pipeline
(irfnriza/Simple-ETL-Pipeline: scrape -> clean/typecast -> multi-sink
load, see /root/reference) as an idiomatic Spark DataFrame engine, and
extends it with the relational + LLM-data-pipeline operators a 100 TB
training-data pipeline needs (joins/aggs/windows, dedup, similarity
search, text analysis, streaming).

Design stance (scale-first):
- All reference transform semantics are native Column expressions
  (whole-stage codegen, no Python round trip) — see functions/cleaning.py.
- No driver-side collects on the data path; small dims broadcast.
- AQE on; decimal-typed reductions where cross-engine determinism matters.
"""

from simple_etl_pipeline_spark.session import get_spark
from simple_etl_pipeline_spark.schemas import RAW_PRODUCT_SCHEMA, CLEAN_PRODUCT_SCHEMA, load_table

__all__ = [
    "get_spark",
    "RAW_PRODUCT_SCHEMA",
    "CLEAN_PRODUCT_SCHEMA",
    "load_table",
]
