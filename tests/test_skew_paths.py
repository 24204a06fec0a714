"""Skew machinery: every bucket class (normal / hot-salted / mega-split)
must generate each true pair exactly once.

The degree-binning analog test: the reference checks bin coverage with
``check_bins`` (/root/reference/src/edge_metrics_binning.cu:204-215) —
every vertex in exactly the right bin; ours is every pair exactly once
regardless of which strategy produced it.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from jaccard_ml_spark.config import DedupConfig
from jaccard_ml_spark.functions.text import shingle_hashes
from jaccard_ml_spark.operators.candidates import (
    candidate_pairs,
    minhash_signatures,
)
from jaccard_ml_spark.operators.verify import verify_pairs


def _identical_docs(spark, n, text="the same boilerplate text repeated " * 8):
    df = spark.createDataFrame(
        [(i, text) for i in range(n)], "id long, text string")
    return df.select("id", shingle_hashes(F.col("text"), 5).alias("items"))


def test_hot_bucket_salted_pairing_complete(spark):
    """120 identical docs → every LSH bucket holds 120 members (> c0=64)
    → salted triangle path; all C(120,2) pairs exactly once."""
    cfg = DedupConfig()
    n = 120
    sets_df = _identical_docs(spark, n)
    sigs = minhash_signatures(sets_df, cfg)
    cands = candidate_pairs(sigs, cfg)
    rows = cands.collect()
    pairs = [(r.id_a, r.id_b) for r in rows]
    assert len(pairs) == len(set(pairs)), "duplicate candidate pairs"
    assert len(set(pairs)) == n * (n - 1) // 2
    verified = verify_pairs(cands, sets_df, cfg.jaccard_threshold)
    assert verified.count() == n * (n - 1) // 2


def test_mega_bucket_band_split_complete(spark):
    """c1 below the bucket size forces the band-split path; identical
    docs still pair up (refined hashes agree on every row)."""
    cfg = DedupConfig(salt_threshold_c0=8, band_split_c1=16, salt_factor=4)
    n = 40
    sets_df = _identical_docs(spark, n)
    sigs = minhash_signatures(sets_df, cfg)
    pairs = {(r.id_a, r.id_b) for r in candidate_pairs(sigs, cfg).collect()}
    assert len(pairs) == n * (n - 1) // 2


def test_mixed_classes_no_cross_talk(spark):
    """Hot group + distinct normal pairs coexist; normal pairs are not
    lost and the hot group does not leak extra pairs."""
    cfg = DedupConfig(salt_threshold_c0=16, salt_factor=4)
    hot = [(i, "identical hot bucket payload words " * 10) for i in range(30)]
    normal = [
        (100, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
        (101, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
        (200, "one two three four five six seven eight nine ten eleven"),
    ]
    df = spark.createDataFrame(hot + normal, "id long, text string")
    sets_df = df.select("id", shingle_hashes(F.col("text"), 5).alias("items"))
    sigs = minhash_signatures(sets_df, cfg)
    pairs = {(r.id_a, r.id_b) for r in candidate_pairs(sigs, cfg).collect()}
    assert (100, 101) in pairs
    hot_pairs = {(a, b) for a, b in pairs if a < 100 and b < 100}
    assert len(hot_pairs) == 30 * 29 // 2
    # doc 200 shares nothing → no candidates
    assert not any(200 in p for p in pairs)
