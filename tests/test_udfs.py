"""pandas_udf surface: the vectorized escape hatch must agree with the
native Column expression it mirrors."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from simple_etl_pipeline_spark.functions.udfs import quality_score_udf
from simple_etl_pipeline_spark.plans.text import txt_doc_features


def test_pandas_udf_matches_column_expr(spark, sf_dir):
    feats = txt_doc_features(spark, sf_dir)
    both = feats.withColumn(
        "udf_score",
        quality_score_udf()("n_tokens", "stopword_ratio", "avg_token_len"),
    )
    rows = both.select("doc_id", "quality_score", "udf_score").collect()
    assert len(rows) > 0
    for r in rows:
        assert r.udf_score == pytest.approx(r.quality_score, rel=1e-12), r.doc_id


def test_asof_join_basic(spark):
    from simple_etl_pipeline_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [(1, 10, "p10"), (1, 5, "p5"), (2, 7, "p7")], "k int, t int, name string"
    )
    right = spark.createDataFrame(
        [(1, 8, 100.0), (1, 3, 50.0), (3, 1, 9.0)], "k int, t int, v double"
    )
    out = {
        r.name: r.last_v
        for r in asof_join(
            left, right, on="k", left_ts="t", right_ts="t", payload={"v": "last_v"}
        ).collect()
    }
    assert out == {"p5": 50.0, "p10": 100.0, "p7": None}


def test_asof_join_tie_is_inclusive(spark):
    from simple_etl_pipeline_spark.operators.asof import asof_join

    left = spark.createDataFrame([(1, 5)], "k int, t int")
    right = spark.createDataFrame([(1, 5, 7.0)], "k int, t int, v double")
    rows = asof_join(
        left, right, on="k", left_ts="t", right_ts="t", payload={"v": "last_v"}
    ).collect()
    assert rows[0].last_v == 7.0  # right_ts == left_ts matches (>= semantics)
