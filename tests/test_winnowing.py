"""Property tests for the winnowing (MOSS) fingerprint sketch.

The guarantee the sketch exists for (Schleimer/Wilkerson/Aiken,
"Winnowing: Local Algorithms for Document Fingerprinting", SIGMOD'03):
any shared token run of length >= WINNOW_WINDOW + shingle_size - 1
between two documents puts one full hash window inside the shared
region, whose minimum is therefore selected in BOTH documents — so the
fingerprint sets intersect. Conversely, documents sharing no shingle at
all can never share a fingerprint (every fingerprint IS some shingle's
hash).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from simple_etl_pipeline_spark.plans.text import (
    WINNOW_WINDOW,
    shingle_hashes_col,
    winnow_fps_col,
)

# shared run long enough for one full window: W + 3 - 1 = W + 2 tokens
_SHARED = " ".join(f"shared{i}" for i in range(WINNOW_WINDOW + 2))


def _fps(spark, rows):
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    hashed = df.select("doc_id", shingle_hashes_col("text").alias("h"))
    out = hashed.select("doc_id", winnow_fps_col("h").alias("fps")).collect()
    return {r.doc_id: set(r.fps) for r in out}

def test_shared_run_shares_a_fingerprint(spark):
    rows = [
        (1, f"alpha bravo charlie delta {_SHARED} echo foxtrot golf"),
        (2, f"one two three {_SHARED} four five six seven"),
    ]
    fps = _fps(spark, rows)
    assert fps[1] & fps[2], "shared W+2-token run must share a fingerprint"


def test_disjoint_vocab_shares_nothing(spark):
    rows = [
        (1, " ".join(f"left{i}" for i in range(20))),
        (2, " ".join(f"right{i}" for i in range(20))),
    ]
    fps = _fps(spark, rows)
    assert fps[1] and fps[2]
    assert not (fps[1] & fps[2]), "no shared shingle => no shared fingerprint"


def test_every_fingerprint_is_a_shingle_hash(spark):
    text = " ".join(f"tok{i % 7}" for i in range(30))
    df = spark.createDataFrame([(1, text)], "doc_id bigint, text string")
    row = (
        df.select(shingle_hashes_col("text").alias("h"))
        .select(F.col("h"), winnow_fps_col("h").alias("fps"))
        .collect()[0]
    )
    assert set(row.fps) <= set(row.h)
    # and the sketch is smaller than the full hash set (it's a sketch)
    assert 0 < len(row.fps) <= len(set(row.h))


def test_identical_docs_have_identical_fps(spark):
    text = " ".join(f"w{i % 5}" for i in range(25))
    fps = _fps(spark, [(1, text), (2, text)])
    assert fps[1] == fps[2]
