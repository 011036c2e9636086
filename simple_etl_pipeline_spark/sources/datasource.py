"""Custom Spark 4 Python Data Source: format "fashion_scrape".

The idiomatic packaging of the reference's scraper (SURVEY.md §2a S1-S2
option b): pages become input partitions, so listing happens once on
the driver and parsing fans out across executors — the reader scales
with page count, unlike the reference's sequential loop.

Usage:
    spark.dataSource.register(FashionScrapeDataSource)
    df = (spark.read.format("fashion_scrape")
          .option("path", "/dir/of/html")          # file mode (hermetic)
          .option("timestamp", "2026-01-01T00:00:00")
          .load())

An http mode (option("base_url", ...) + option("pages", N)) fetches in
the partition reader with the reference's politeness delay — one page
per partition, so the delay parallelizes instead of serializing.
"""

from __future__ import annotations

import os

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

from simple_etl_pipeline_spark.schemas import RAW_PRODUCT_SCHEMA

_COLS = [f.name for f in RAW_PRODUCT_SCHEMA.fields]


class _PagePartition(InputPartition):
    def __init__(self, file_path: str | None = None, url: str | None = None):
        self.file_path = file_path
        self.url = url


class FashionScrapeReader(DataSourceReader):
    def __init__(self, options: dict):
        self.path = options.get("path")
        self.base_url = options.get("base_url")
        self.n_pages = int(options.get("pages", "50"))
        self.timestamp = options.get("timestamp", "1970-01-01T00:00:00")
        self.delay = float(options.get("delay_seconds", "1.5"))
        if not self.path and not self.base_url:
            raise ValueError("fashion_scrape requires option 'path' or 'base_url'")

    def partitions(self):
        if self.path:
            files = sorted(
                os.path.join(self.path, f)
                for f in os.listdir(self.path)
                if f.endswith((".html", ".htm"))
            )
            return [_PagePartition(file_path=f) for f in files]
        from simple_etl_pipeline_spark.sources.scrape import build_page_url

        return [
            _PagePartition(url=build_page_url(self.base_url, p))
            for p in range(1, self.n_pages + 1)
        ]

    def read(self, partition: _PagePartition):
        from simple_etl_pipeline_spark.sources.scrape import parse_products_html

        if partition.file_path:
            with open(partition.file_path, encoding="utf-8") as f:
                html = f.read()
        else:
            import time
            import urllib.request

            time.sleep(self.delay)  # politeness, paid once per partition
            try:
                with urllib.request.urlopen(partition.url, timeout=10) as resp:
                    html = resp.read().decode("utf-8", errors="replace")
            except Exception:  # per-page skip, like the reference
                return
        for rec in parse_products_html(html, self.timestamp):
            yield tuple(rec[c] for c in _COLS)


class FashionScrapeDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "fashion_scrape"

    def schema(self):
        return RAW_PRODUCT_SCHEMA

    def reader(self, schema) -> FashionScrapeReader:
        return FashionScrapeReader(self.options)
