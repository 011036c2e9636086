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
