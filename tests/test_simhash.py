"""SimHash path: Hamming-ball pair generation is exact within radius."""

from __future__ import annotations

from pyspark.sql import functions as F

from jaccard_ml_spark.config import DedupConfig
from jaccard_ml_spark.functions.text import shingle_hashes
from jaccard_ml_spark.operators.simhash_path import (
    simhash_fingerprints,
    simhash_near_pairs,
)

CFG = DedupConfig()


def _sets(spark, rows):
    df = spark.createDataFrame(rows, "id long, text string")
    return df.select("id", shingle_hashes(F.col("text"), 3).alias("items"))


def test_exact_duplicates_have_hamming_zero(spark):
    rows = [(1, "a b c d e f g h i j"), (2, "a b c d e f g h i j"),
            (3, "completely different words entirely here now")]
    fps = simhash_fingerprints(_sets(spark, rows), CFG)
    pairs = {(r.id_a, r.id_b): r.hamming
             for r in simhash_near_pairs(fps, CFG).collect()}
    assert pairs.get((1, 2)) == 0
    assert (1, 3) not in pairs and (2, 3) not in pairs


def test_block_join_is_exact_within_radius(spark):
    """Pigeonhole block join finds exactly the brute-force pairs."""
    import itertools

    rows = [(i, " ".join(
        f"w{(i * 7 + j) % 23}" for j in range(30))) for i in range(60)]
    fps_df = simhash_fingerprints(_sets(spark, rows), CFG)
    fps = {r.id: r.simhash for r in fps_df.collect()}

    def ham(a, b):
        return bin((a ^ b) & 0xFFFFFFFFFFFFFFFF).count("1")

    brute = {
        (a, b)
        for a, b in itertools.combinations(sorted(fps), 2)
        if ham(fps[a], fps[b]) <= CFG.simhash_hamming_max
    }
    got = {(r.id_a, r.id_b)
           for r in simhash_near_pairs(fps_df, CFG).collect()}
    assert got == brute
