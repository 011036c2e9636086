"""Structural invariants of the round-5 operators — properties the
oracle hash cannot state directly: the stats query and the physical
Bloom index must build IDENTICAL filters for identical layouts, the
mixture manifest's policy algebra, and a Python reference executable
of the Gopher repetition spec on crafted documents.
"""

from __future__ import annotations

import re
from collections import Counter

from pyspark.sql import functions as F


# --- skip_bloom_stats vs the physical per-file index ----------------------
def test_bloom_stats_match_physical_index_on_same_layout(spark, sf_dir, tmp_path):
    """Write documents physically partitioned by the SAME doc_id div N
    rule the stats query buckets by; the input_file_name-keyed
    build_bloom_index must then produce byte-identical filter words per
    file. This pins the two consumers of bloom_word_fold together — a
    drift in either path (hashing, word layout, null handling) breaks
    the equality."""
    from simple_etl_pipeline_spark.operators.skipping import build_bloom_index
    from simple_etl_pipeline_spark.plans.events import (
        SKIP_BLOOM_FILE_ROWS,
        skip_bloom_stats,
    )
    from simple_etl_pipeline_spark.schemas import load_table

    out = str(tmp_path / "by_file")
    (
        load_table(spark, sf_dir, "documents")
        .withColumn("file_id", F.expr(f"doc_id div {SKIP_BLOOM_FILE_ROWS}"))
        .repartition(1)
        .write.partitionBy("file_id")
        .parquet(out)
    )
    physical = {}
    for r in build_bloom_index(spark, out, "doc_id").collect():
        m = re.search(r"file_id=(\d+)", r["file"])
        assert m, r["file"]
        physical[int(m.group(1))] = (r["n_rows"], dict(r["words"]))
    stats_rows = skip_bloom_stats(spark, sf_dir).collect()
    assert set(physical) == {r.file_id for r in stats_rows}
    # recompute the stats query's words_md5 from the physical words
    import hashlib

    for r in stats_rows:
        n_rows, words = physical[r.file_id]
        assert n_rows == r.n_rows
        joined = ",".join(f"{w}:{words[w]}" for w in sorted(words))
        assert hashlib.md5(joined.encode()).hexdigest() == r.words_md5
        assert r.n_words == len(words)
        assert r.n_set_bits == sum(bin(m).count("1") for m in words.values())


# --- mixture manifest policy algebra --------------------------------------
def test_mixture_manifest_policy_algebra(spark, sf_dir):
    from simple_etl_pipeline_spark.plans.text import (
        MANIFEST_BUCKETS,
        MANIFEST_BUDGET_PCT,
        txt_mixture_manifest,
    )

    rows = txt_mixture_manifest(spark, sf_dir).collect()
    assert rows
    total = sum(r.sum_tokens for r in rows)
    n = len(rows)
    target = total * MANIFEST_BUDGET_PCT // (100 * n)
    for r in rows:
        # uniform policy: every stratum gets the same token target
        assert r.target_tokens == target
        assert 0 <= r.threshold_ppm <= MANIFEST_BUCKETS
        assert r.n_sampled <= r.n_docs
        assert r.sampled_tokens <= r.sum_tokens
        # a fully-open stratum must draw everything
        if r.threshold_ppm == MANIFEST_BUCKETS:
            assert r.n_sampled == r.n_docs
            assert r.sampled_tokens == r.sum_tokens
        # closed-form replay: the draw is exactly the md5-bucket rule
        assert r.realized_ppm == r.sampled_tokens * MANIFEST_BUCKETS // r.sum_tokens


# --- Gopher repetition: Python reference executable of the spec -----------
def _py_repetition(text: str) -> tuple[int, int, int, int, int]:
    toks = text.split()
    n_words = len(toks)
    total_chars = sum(len(t) for t in toks) + n_words - 1

    def grams(n):
        return [" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)]

    def top_cover(n):
        c = Counter(grams(n))
        if not c:
            return 0
        cmax = max(c.values())
        return max(k * len(g) for g, k in c.items() if k == cmax)

    dup5 = sum(
        k * len(g) for g, k in Counter(grams(5)).items() if k >= 2
    )
    return (
        n_words,
        total_chars,
        top_cover(2) * 1_000_000 // total_chars,
        top_cover(3) * 1_000_000 // total_chars,
        dup5 * 1_000_000 // total_chars,
    )


def test_gopher_repetition_matches_python_reference(spark, tmp_path):
    from simple_etl_pipeline_spark.plans.text import txt_gopher_repetition
    from simple_etl_pipeline_spark.schemas import TABLE_SCHEMAS

    texts = [
        # boilerplate loop: top-2-gram dominates -> rejected
        "x y x y x y",
        # clean prose-like stream -> kept
        "alpha beta gamma delta epsilon zeta eta theta iota kappa",
        # repeated 5-gram block: dup5 fires while top2 stays moderate
        "a b c d e a b c d e a b c d e",
        # tie on the top count: cover must break the tie by max chars
        "aa bb aa bb cc ddd cc ddd xyz",
        # single token: no grams at all, everything 0
        "solo",
    ]
    rows = [
        (i, t, "en", "unit", len(t)) for i, t in enumerate(texts)
    ]
    out = str(tmp_path / "docs")
    spark.createDataFrame(rows, TABLE_SCHEMAS["documents"]).write.parquet(
        out + "/documents.parquet"
    )
    got = {
        r.doc_id: (r.n_words, r.total_chars, r.top2_ppm, r.top3_ppm, r.dup5_ppm)
        for r in txt_gopher_repetition(spark, out).collect()
    }
    assert set(got) == set(range(len(texts)))
    for i, t in enumerate(texts):
        assert got[i] == _py_repetition(t), (i, t, got[i], _py_repetition(t))


# --- rot60 gram-key composition: python reference vs both engines ---------
def _py_md5_hash60(s: str) -> int:
    import hashlib

    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _py_rot60(h: int, s: int) -> int:
    if s == 0:
        return h
    return ((h & ((1 << (60 - s)) - 1)) << s) | (h >> (60 - s))


def test_rot60_composition_matches_python_and_duckdb(spark):
    """The span-dedup/repetition gram key — XOR of position-rotated
    60-bit token hashes — recomputed three ways (python reference,
    Spark Columns, DuckDB SQL) over a fixed token list: all equal, and
    every value stays in [0, 2^60) (no sign flip in either BIGINT)."""
    import duckdb
    from pyspark.sql import functions as F

    from simple_etl_pipeline_spark.functions.text import (
        GRAM_ROT_STEP,
        md5_hash60,
        rot60,
        sql_md5_hash60,
        sql_rot60,
    )

    toks = ["alpha", "beta", "gamma", "delta", "epsilon", "beta", "alpha"]
    n = 5
    th = [_py_md5_hash60(t) for t in toks]
    expected = []
    for i in range(len(toks) - n + 1):
        gh = th[i]
        for j in range(1, n):
            gh ^= _py_rot60(th[i + j], (GRAM_ROT_STEP * j) % 60)
        assert 0 <= gh < (1 << 60)
        expected.append(gh)

    # Spark: same composition over literal columns
    cols = []
    for i in range(len(toks) - n + 1):
        gh = md5_hash60(F.lit(toks[i]))
        for j in range(1, n):
            gh = gh.bitwiseXOR(
                rot60(md5_hash60(F.lit(toks[i + j])), (GRAM_ROT_STEP * j) % 60)
            )
        cols.append(gh.alias(f"g{i}"))
    got_spark = list(spark.range(1).select(*cols).first())
    assert got_spark == expected

    # DuckDB: the sql twins
    exprs = []
    for i in range(len(toks) - n + 1):
        gh = f"({sql_md5_hash60(repr(toks[i]))})"
        for j in range(1, n):
            gh = (
                f"xor({gh}, "
                f"{sql_rot60(sql_md5_hash60(repr(toks[i + j])), (GRAM_ROT_STEP * j) % 60)})"
            )
        exprs.append(gh)
    got_duck = list(duckdb.sql("SELECT " + ", ".join(exprs)).fetchone())
    assert got_duck == expected
