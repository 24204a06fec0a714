"""Stats→config derivation (the reference's ML work-distribution model
reborn): derived skew parameters bound task sizes on corpora whose
skew does not match the static defaults, with candidates unchanged."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from jaccard_ml_spark.config import DedupConfig
from jaccard_ml_spark.operators.autotune import derive_skew_params
from jaccard_ml_spark.operators.candidates import candidate_pairs

CFG = DedupConfig()


def test_derive_uniform_corpus_keeps_cheap_path():
    # almost everything singleton, a few small buckets → tiny c0 is
    # fine (99.9% of buckets pair in-task), no aggressive salting
    hist = [(1, 100_000), (2, 500), (3, 40)]
    p = derive_skew_params(hist, CFG)
    assert p.salt_threshold_c0 == 16        # floor
    assert p.salt_factor == 2               # nothing hot to split
    assert p.band_split_extra_rows == CFG.band_split_extra_rows


def test_derive_planted_mega_bucket_bounds_tasks():
    """A 200k-member boilerplate bucket: static defaults (c1=4096,
    extra=4) would leave salted blocks of (200000/8)² = 625M pairs per
    task — the derived params split it instead."""
    hist = [(1, 1_000_000), (64, 1000), (200_000, 8)]
    p = derive_skew_params(hist, CFG)
    budget = 2_000_000
    # mega path engaged well below the monster bucket
    assert p.band_split_c1 < 200_000
    # salted blocks of the largest NON-mega bucket fit the budget
    worst_block = (min(p.band_split_c1, 200_000) / p.salt_factor) ** 2
    assert worst_block <= budget * 1.1
    # refinement uses more extra rows than the static default
    assert p.band_split_extra_rows >= CFG.band_split_extra_rows
    # and the record carries the evidence
    assert p.max_bucket == 200_000 and p.n_buckets == 1_001_008


def test_derive_is_deterministic_and_histogram_order_free():
    hist = [(1, 5000), (7, 12), (900, 3), (64, 88)]
    a = derive_skew_params(sorted(hist), CFG)
    b = derive_skew_params(sorted(hist, reverse=True) and sorted(hist),
                           CFG)
    assert a == b


@pytest.fixture(scope="module")
def planted_signatures(spark):
    """400 unique docs + one 150-member identical-signature clique —
    hot-bucket skew the static c0=64 classifies as 'hot' and a derived
    config must still pair exactly once."""
    rng = np.random.default_rng(7)
    rows = []
    for i in range(400):
        sig = rng.integers(-2**62, 2**62, size=CFG.num_perm).tolist()
        rows.append((f"u{i:04d}", 30, sig))
    clique_sig = list(range(1, CFG.num_perm + 1))
    for i in range(150):
        rows.append((f"dup{i:04d}", 30, clique_sig))
    return spark.createDataFrame(
        rows, "id string, set_size int, signature array<bigint>"
    ).repartition(8).persist()


def test_auto_tune_preserves_exactly_once_candidates(planted_signatures):
    static = {(r.id_a, r.id_b) for r in
              candidate_pairs(planted_signatures, CFG).collect()}
    tuned_rec: dict = {}
    tuned = {(r.id_a, r.id_b) for r in
             candidate_pairs(planted_signatures, CFG, auto_tune=True,
                             tuned=tuned_rec).collect()}
    clique = sorted(f"dup{i:04d}" for i in range(150))
    expected_clique = {(a, b) for i, a in enumerate(clique)
                       for b in clique[i + 1:]}
    assert expected_clique <= static
    assert expected_clique <= tuned
    assert static == tuned
    # derived record captured for the metrics table
    assert tuned_rec["max_bucket"] == 150
    assert tuned_rec["salt_factor"] >= 2
    # exactly-once: candidate_pairs returns distinct rows
    n = candidate_pairs(planted_signatures, CFG, auto_tune=True).count()
    assert n == len(tuned)
