from __future__ import annotations

import pytest

from simple_etl_pipeline_spark.multimodal.features import (
    decode_image,
    extract_blob_features,
    with_blob_column,
)


def test_blob_features_deterministic(spark):
    docs = spark.createDataFrame(
        [(0, "abc"), (1, "zz"), (2, "")], "doc_id long, text string"
    )
    out = {r.doc_id: r for r in extract_blob_features(with_blob_column(docs)).collect()}
    assert out[0].size_bytes == 3
    assert out[0].mean_byte == pytest.approx((97 + 98 + 99) / 3)
    assert out[0].mime == "image/png"
    assert out[1].mime == "audio/wav"
    assert out[2].size_bytes == 0 and out[2].mean_byte == 0.0
    assert out[0].width == 3 and out[0].height == 3


def test_decode_stub_raises():
    with pytest.raises(NotImplementedError):
        decode_image(b"\x89PNG", "image/png")


def test_phash_weight_staging_survives_giant_clusters(spark):
    """The r15 decimal(38,0) weight staging (carried r12 watch-item):
    at m = 4e9 members the INTERMEDIATE m*(m-1) exceeds bigint even
    though the final C(m,2) still fits — the unstaged expression
    throws ARITHMETIC_OVERFLOW under Spark 4 ANSI, while the staged
    expression mm_phash_dedup ships returns the exact value. Pins the
    staging against a refactor that 'simplifies' the casts away."""
    from pyspark.sql import functions as F

    df = spark.createDataFrame([(4_000_000_000,)], "m bigint")
    want = 4_000_000_000 * (4_000_000_000 - 1) // 2
    staged = df.select(
        F.expr(
            "CAST(CAST(m AS decimal(38,0)) * (m - 1) div 2 AS BIGINT)"
        ).alias("w")
    ).collect()[0][0]
    assert staged == want
    with pytest.raises(Exception, match="ARITHMETIC_OVERFLOW|overflow"):
        df.select(F.expr("m * (m - 1) div 2").alias("w")).collect()
    # the near-pair product: staged arithmetic is exact through the
    # decimal intermediate; when even the RESULT exceeds bigint
    # (4e9 * 4e9 = 1.6e19) the ANSI cast throws LOUDLY instead of
    # wrapping silently — the honest failure mode, matching DuckDB's
    # HUGEINT-to-BIGINT cast error
    paired = spark.createDataFrame(
        [(4_000_000_000, 4_000_000_000)], "ma bigint, mb bigint"
    )
    with pytest.raises(Exception, match="OVERFLOW|overflow"):
        paired.select(
            F.expr("CAST(CAST(ma AS decimal(38,0)) * mb AS BIGINT)").alias(
                "w"
            )
        ).collect()
    # in-range near product stays exact
    paired2 = spark.createDataFrame(
        [(3_000_000_000, 3_000_000_000)], "ma bigint, mb bigint"
    )
    assert paired2.select(
        F.expr("CAST(CAST(ma AS decimal(38,0)) * mb AS BIGINT)").alias("w")
    ).collect()[0][0] == 9 * 10**18
