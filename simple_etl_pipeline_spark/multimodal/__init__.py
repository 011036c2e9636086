from simple_etl_pipeline_spark.multimodal.features import (
    decode_image,
    extract_blob_features,
    with_blob_column,
)

__all__ = ["with_blob_column", "extract_blob_features", "decode_image"]
