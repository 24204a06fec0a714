"""SimHash near-textual duplicate path (SURVEY §7.2.7).

Candidates are generated with the standard multi-probe trick for
Hamming-ball search: split the w-bit fingerprint into (hamming_max+1)
blocks — two fingerprints within Hamming distance d must agree exactly
on at least one block (pigeonhole), so an equi-join per block finds all
candidates. Verification computes the exact Hamming distance with
``bit_count`` (JVM).

Same candidates→verify architecture as the MinHash path; block tables
reuse the bucket machinery's skew properties (a boilerplate-heavy
corpus makes hot *blocks*, and the same salting applies — here we rely
on AQE skew-join splitting because block joins are binary equi-joins,
not bucket explosions).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from jaccard_ml_spark.config import DedupConfig
from jaccard_ml_spark.functions.hashing import hamming_distance64, simhash_udf


def simhash_fingerprints(sets_df: DataFrame, cfg: DedupConfig,
                         id_col: str = "id",
                         items_col: str = "items") -> DataFrame:
    """(id, simhash) — 64-bit fingerprint per document."""
    sh = simhash_udf(cfg.simhash_bits, cfg.minhash_seed)
    return sets_df.select(
        F.col(id_col).alias("id"),
        sh(F.col(items_col)).alias("simhash"),
    ).where(F.size(items_col) > 0)


def _blocks(fp: DataFrame, n_blocks: int, bits: int) -> DataFrame:
    """Explode fingerprints into (block_id, block_value, id) rows."""
    width = bits // n_blocks
    mask = (1 << width) - 1
    block_cols = F.array(*[
        F.struct(
            F.lit(b).alias("block_id"),
            F.shiftrightunsigned(F.col("simhash"), b * width)
            .bitwiseAND(F.lit(mask)).alias("block_value"),
        )
        for b in range(n_blocks)
    ])
    return (
        fp.select("id", "simhash", F.explode(block_cols).alias("blk"))
        .select("id", "simhash",
                F.col("blk.block_id").alias("block_id"),
                F.col("blk.block_value").alias("block_value"))
    )


def simhash_near_pairs(fingerprints: DataFrame, cfg: DedupConfig) -> DataFrame:
    """All pairs within Hamming distance ≤ cfg.simhash_hamming_max.

    Exact within the radius (pigeonhole over hamming_max+1 blocks).
    Returns (id_a, id_b, hamming).
    """
    n_blocks = cfg.simhash_hamming_max + 1
    blocks = _blocks(fingerprints, n_blocks, cfg.simhash_bits)

    left = blocks.select("block_id", "block_value",
                         F.col("id").alias("id_a"),
                         F.col("simhash").alias("_sa"))
    right = blocks.select("block_id", "block_value",
                          F.col("id").alias("id_b"),
                          F.col("simhash").alias("_sb"))
    cands = (
        left.join(right, ["block_id", "block_value"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "_sa", "_sb")
        .distinct()
    )
    return (
        cands
        .withColumn("hamming",
                    hamming_distance64(F.col("_sa"), F.col("_sb"))
                    .cast("long"))
        .where(F.col("hamming") <= cfg.simhash_hamming_max)
        .select("id_a", "id_b", "hamming")
    )
