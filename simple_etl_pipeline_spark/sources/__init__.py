from simple_etl_pipeline_spark.sources.scrape import (
    build_page_url,
    ingest_html_files,
    parse_products_html,
)

__all__ = ["parse_products_html", "ingest_html_files", "build_page_url"]
