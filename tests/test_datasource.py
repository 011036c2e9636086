from __future__ import annotations

import pytest

from simple_etl_pipeline_spark.sources.datasource import FashionScrapeDataSource

CARD = """
<div class="product-card">
  <h3 class="product-title">DS Product {i}</h3>
  <span class="price">${i}.00</span>
  <p>Rating: 4.{i} / 5</p><p>2 Colors</p><p>Size: M</p><p>Gender: Men</p>
</div>
"""


@pytest.fixture()
def pages_dir(tmp_path):
    for i in range(3):
        (tmp_path / f"page{i}.html").write_text(
            f"<html><body>{CARD.format(i=i)}</body></html>"
        )
    (tmp_path / "ignored.txt").write_text("not html")
    return tmp_path


def test_custom_datasource_reads_pages(spark, pages_dir):
    spark.dataSource.register(FashionScrapeDataSource)
    df = (
        spark.read.format("fashion_scrape")
        .option("path", str(pages_dir))
        .option("timestamp", "2026-02-02T00:00:00")
        .load()
    )
    rows = df.orderBy("title").collect()
    assert [r.title for r in rows] == ["DS Product 0", "DS Product 1", "DS Product 2"]
    assert rows[1].price == "$1.00"
    assert all(r.timestamp == "2026-02-02T00:00:00" for r in rows)
    # one partition per page
    assert df.rdd.getNumPartitions() == 3


def test_custom_datasource_requires_source_option(spark, pages_dir):
    spark.dataSource.register(FashionScrapeDataSource)
    with pytest.raises(Exception, match="path|base_url"):
        spark.read.format("fashion_scrape").load().collect()
