"""Multimodal column plumbing: opaque binary payloads + typed metadata,
with feature extraction as Arrow-batched pandas over mapInPandas.

The container has no image/audio codecs, so decode_image is a stub
(NotImplementedError) with the real interface documented; the Spark
side — schema, batch iteration, partitioning — is real and tested with
deterministic byte-level features. At 100 TB the blobs stay columnar
parquet binary; only the needed columns are scanned, and feature
extraction streams batch-by-batch through executors without ever
collecting.
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

BLOB_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("mime", T.StringType()),
        T.StructField("size_bytes", T.LongType()),
        T.StructField("mean_byte", T.DoubleType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
    ]
)

_MIMES = ["image/png", "audio/wav", "video/mp4"]


def with_blob_column(docs: DataFrame) -> DataFrame:
    """Synthesize a binary payload column + mime metadata from the
    documents table (the testdata has no real media; the payload is the
    utf-8 text bytes, which keeps every downstream number deterministic).
    """
    mime = F.element_at(
        F.array(*[F.lit(m) for m in _MIMES]), (F.col("doc_id") % 3 + 1).cast("int")
    )
    return docs.select(
        "doc_id",
        F.col("text").cast("binary").alias("blob"),
        mime.alias("mime"),
    )


def decode_image(blob: bytes, mime: str):
    """Real decoder interface: bytes -> (height, width, channels) array.

    STUB: the runtime image libraries (Pillow/opencv/ffmpeg) are not in
    this container. Wire the real implementation here; everything
    upstream (batching, schema, partitioning) already handles it.
    """
    raise NotImplementedError(
        "image/audio decode requires codec libraries not present in this "
        "environment; extract_blob_features uses deterministic byte-level "
        "features instead"
    )


def extract_blob_features(df: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over (doc_id, blob, mime).

    Features are deterministic byte statistics standing in for decoded
    media properties; the mapInPandas shape (pandas batches in/out,
    vectorized numpy inside) is exactly what a real decoder plugs into.
    """
    import numpy as np
    import pandas as pd

    def batch_features(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            sizes = pdf["blob"].map(len)
            means = [
                float(np.frombuffer(b, dtype=np.uint8).mean()) if len(b) else 0.0
                for b in pdf["blob"]
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "mime": pdf["mime"],
                    "size_bytes": sizes.astype("int64"),
                    "mean_byte": means,
                    # stand-in dimensions a decoder would produce
                    "width": (sizes % 640).astype("int32"),
                    "height": (sizes % 480).astype("int32"),
                }
            )

    return df.mapInPandas(batch_features, BLOB_FEATURE_SCHEMA)
