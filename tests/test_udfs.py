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


def test_trimmed_mean_udaf_equals_column_expr(spark, sf_dir):
    from pyspark.sql import functions as F

    from simple_etl_pipeline_spark.functions.udfs import trimmed_mean_udaf
    from simple_etl_pipeline_spark.schemas import load_table

    orders = load_table(spark, sf_dir, "orders")
    via_udaf = {
        r.o_orderstatus: r.tm
        for r in orders.groupBy("o_orderstatus")
        .agg(trimmed_mean_udaf()("o_totalprice").alias("tm"))
        .collect()
    }
    via_columns = {
        r.o_orderstatus: r.tm
        for r in orders.groupBy("o_orderstatus")
        .agg(
            (
                (F.sum("o_totalprice") - F.min("o_totalprice") - F.max("o_totalprice"))
                / (F.count(F.lit(1)) - 2)
            ).alias("tm")
        )
        .collect()
    }
    assert set(via_udaf) == set(via_columns)
    for k in via_udaf:
        assert via_udaf[k] == pytest.approx(via_columns[k], rel=1e-9), k


def test_ngrams_udtf_equals_native_shingles(spark):
    from pyspark.sql import functions as F

    from simple_etl_pipeline_spark.functions.text import shingles_col
    from simple_etl_pipeline_spark.functions.udfs import ngrams_udtf

    docs = spark.createDataFrame(
        [(1, "the quick brown fox jumps"), (2, "too short"), (3, None)],
        "doc_id long, text string",
    )
    NGrams = ngrams_udtf()
    via_udtf = sorted(
        (r.doc_id, r.pos, r.ngram)
        for r in docs.lateralJoin(
            NGrams(F.col("text").outer(), F.lit(3)).alias("g")
        )
        .select("doc_id", "g.pos", "g.ngram")
        .collect()
        if r.ngram is not None
    )
    # posexplode positions are 0-based, same as the UDTF's enumerate
    via_native = sorted(
        (r.doc_id, r.pos, r.ngram)
        for r in docs.select(
            "doc_id", F.posexplode(shingles_col("text")).alias("pos", "ngram")
        ).collect()
    )
    assert via_udtf == via_native
