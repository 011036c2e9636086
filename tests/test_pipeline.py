from __future__ import annotations

import csv

from simple_etl_pipeline_spark.pipeline import run_pipeline

PAGE = """
<html><body>
<div class="product-card">
  <h3 class="product-title">Shirt 1</h3>
  <span class="price">$10.00</span>
  <p>Rating: 4.0 / 5</p><p>3 Colors</p><p>Size: M</p><p>Gender: Men</p>
</div>
<div class="product-card">
  <h3 class="product-title">Unknown Product</h3>
  <span class="price">N/A</span>
  <p>Rating: N/A</p><p>Unknown Colors</p><p>Size: </p><p>Gender: </p>
</div>
</body></html>
"""


def test_pipeline_end_to_end(spark, tmp_path):
    pages = tmp_path / "pages"
    out = tmp_path / "out"
    pages.mkdir()
    (pages / "p1.html").write_text(PAGE)

    assert run_pipeline(spark, str(pages), str(out), preview=False) is True
    with open(out / "products.csv") as f:
        rows = list(csv.DictReader(f))
    assert len(rows) == 1  # dirty card dropped
    assert rows[0]["title"] == "Shirt 1"
    assert float(rows[0]["price"]) == 160000.0  # $10 x 16000


def test_pipeline_empty_extraction_aborts(spark, tmp_path):
    pages = tmp_path / "empty_pages"
    pages.mkdir()
    (pages / "p1.html").write_text("<html><body>no cards</body></html>")
    assert run_pipeline(spark, str(pages), str(tmp_path / "o"), preview=False) is False
