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
    # NULL payloads (a failed fetch/transcode at 100 TB) carry nothing
    # to process and would crash len() inside the Arrow-batched
    # extractors — dropped at the source, mirrored by the oracles'
    # text IS NOT NULL (adversarial-corpus finding, round 5)
    return docs.filter(F.col("text").isNotNull()).select(
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


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.LongType()),
        T.StructField("frame_md5", T.StringType()),
    ]
)


def sample_frames(df: DataFrame, frame_bytes: int = 64, every: int = 4) -> DataFrame:
    """Frame sampling over video blobs: each blob is split into
    consecutive ``frame_bytes`` windows ("frames" — a real decoder would
    produce these from the container format) and every ``every``-th full
    frame is emitted as its own row.

    This is the 1 -> N cardinality change real frame sampling performs,
    expressed as mapInPandas so one input batch yields a variable-length
    output batch without any explode-side shuffle; at 100 TB the frame
    rows inherit the input partitioning (no repartition needed until a
    downstream keyed op)."""
    import hashlib

    import pandas as pd

    def batch_frames(batches):
        for pdf in batches:
            out = {"doc_id": [], "frame_idx": [], "frame_md5": []}
            for doc_id, blob in zip(pdf["doc_id"], pdf["blob"]):
                n_frames = len(blob) // frame_bytes
                for i in range(0, n_frames, every):
                    out["doc_id"].append(doc_id)
                    out["frame_idx"].append(i)
                    # md5 over the UPPERCASE HEX of the frame bytes —
                    # not the raw bytes — because the DuckDB oracle's
                    # md5() accepts only VARCHAR and a byte window may
                    # split a multi-byte char (not valid utf-8); the
                    # hex form is an equally exact content key
                    out["frame_md5"].append(
                        hashlib.md5(
                            blob[i * frame_bytes : (i + 1) * frame_bytes]
                            .hex()
                            .upper()
                            .encode()
                        ).hexdigest()
                    )
            yield pd.DataFrame(out).astype(
                {"doc_id": "int64", "frame_idx": "int64"}
            )

    return df.mapInPandas(batch_frames, FRAME_SCHEMA)


RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("resized_md5", T.StringType()),
        T.StructField("resized_sum", T.LongType()),
        T.StructField("resized_mean", T.DoubleType()),
    ]
)


def resize_blob(df: DataFrame, target: int = 32) -> DataFrame:
    """Nearest-neighbor resize of an image blob to ``target`` samples:
    sample index i reads source byte (i*size)//target — exact integer
    arithmetic, so the identical bytes are computable in any engine.
    Works for both down- and up-sampling (bytes repeat when
    size < target). The real decoder would do this per pixel row; the
    plumbing (Arrow batches, fixed output schema) is identical."""
    import hashlib

    import pandas as pd

    def batch_resize(batches):
        for pdf in batches:
            out = {"doc_id": [], "resized_md5": [], "resized_sum": [], "resized_mean": []}
            for doc_id, blob in zip(pdf["doc_id"], pdf["blob"]):
                if len(blob) == 0:
                    continue
                sampled = bytes(
                    blob[(i * len(blob)) // target] for i in range(target)
                )
                out["doc_id"].append(doc_id)
                # md5 of the uppercase hex (see sample_frames note)
                out["resized_md5"].append(
                    hashlib.md5(sampled.hex().upper().encode()).hexdigest()
                )
                out["resized_sum"].append(sum(sampled))
                out["resized_mean"].append(sum(sampled) / float(target))
            yield pd.DataFrame(out).astype(
                {"doc_id": "int64", "resized_sum": "int64"}
            )

    return df.mapInPandas(batch_resize, RESIZE_SCHEMA)
