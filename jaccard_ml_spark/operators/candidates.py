"""LSH candidate-pair generation with explicit skew handling.

This is the reference's degree-aware work distribution reborn
(SURVEY §4.4). The reference bins vertices by degree range
(``/root/reference/src/edge_metrics_binning.cu:45-63``) and launches a
differently-parameterized kernel per bin; we bin LSH buckets by
cardinality and give each class its own pairing strategy:

  normal  (size ≤ c0)   plain self-join within the bucket
  hot     (c0 < size ≤ c1)  salted triangle pairing: members get a
          deterministic salt in [0,S); pairs are generated inside
          salt-blocks (p,q), p ≤ q, so one boilerplate bucket spreads
          over S(S+1)/2 tasks instead of drowning one task — the
          (g, a) search-group/assembly idea of the reference
          (README.md:72) mapped to shuffle parallelism
  mega    (size > c1)   band splitting: the band hash is too coarse
          (the bucket is boilerplate-driven); members are re-bucketed
          with rows_per_band + Δ signature rows — the reference's
          fallback-kernel-when-SM-overflows move
          (/root/reference/src/main.cu:313-323)

All salts are deterministic functions of conv_id, so candidate sets are
identical at any parallelism level.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from jaccard_ml_spark.config import DedupConfig
from jaccard_ml_spark.functions.hashing import band_hash_cols, minhash_udf


def minhash_signatures(sets_df: DataFrame, cfg: DedupConfig,
                       id_col: str = "id",
                       items_col: str = "items") -> DataFrame:
    """(id, items) → (id, set_size, signature)."""
    mh = minhash_udf(cfg.num_perm, cfg.minhash_seed)
    return sets_df.select(
        F.col(id_col).alias("id"),
        F.size(items_col).alias("set_size"),
        mh(F.col(items_col)).alias("signature"),
    ).where(F.col("signature").isNotNull())


def lsh_buckets(signatures: DataFrame, cfg: DedupConfig) -> DataFrame:
    """(id, signature) → (band_id, bucket_hash, id), one row per band."""
    return (
        signatures
        .select(
            "id", "signature",
            F.posexplode(
                band_hash_cols(F.col("signature"), cfg.bands,
                               cfg.rows_per_band)
            ).alias("band_id", "bucket_hash"),
        )
        .select("band_id", "bucket_hash", "id", "signature")
    )


def bucket_stats(buckets: DataFrame) -> DataFrame:
    """Per-bucket cardinality — the degree-histogram analog
    (/root/reference/src/utils.cuh:326-367) that drives strategy choice."""
    return buckets.groupBy("band_id", "bucket_hash").agg(
        F.count("*").alias("bucket_size"))


def _pairs_from_buckets(buckets: DataFrame) -> DataFrame:
    """Self-join members of each bucket → canonical (id_a < id_b) pairs."""
    left = buckets.select("band_id", "bucket_hash", F.col("id").alias("id_a"))
    right = buckets.select("band_id", "bucket_hash", F.col("id").alias("id_b"))
    return (
        left.join(right, ["band_id", "bucket_hash"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
    )


def _salted_pairs(buckets: DataFrame, salt_factor: int) -> DataFrame:
    """Triangle-block pairing for hot buckets.

    Member with salt s joins block (p=s, q) for q ≥ s on the A side and
    block (p, q=s) for p ≤ s on the B side; block (p, p) pairs within
    one salt class. Every unordered pair appears in exactly one block.
    """
    S = salt_factor
    with_salt = buckets.withColumn(
        "salt", F.pmod(F.xxhash64("id", F.lit("salt")), F.lit(S)).cast("int"))

    a_side = with_salt.select(
        "band_id", "bucket_hash", F.col("id").alias("id_a"), "salt"
    ).withColumn("q", F.explode(F.sequence(F.col("salt"), F.lit(S - 1)))) \
     .select("band_id", "bucket_hash", "id_a",
             F.col("salt").alias("p"), "q")

    b_side = with_salt.select(
        "band_id", "bucket_hash", F.col("id").alias("id_b"), "salt"
    ).withColumn("p", F.explode(F.sequence(F.lit(0), F.col("salt")))) \
     .select("band_id", "bucket_hash", "id_b", "p",
             F.col("salt").alias("q"))

    # p < q blocks: one orientation per unordered pair already (A side
    # carries salt p members, B side salt q members) → canonicalize with
    # least/greatest. p == q blocks: the self-join yields both
    # orientations → keep id_a < id_b only.
    return (
        a_side.join(b_side, ["band_id", "bucket_hash", "p", "q"])
        .where((F.col("p") != F.col("q"))
               | (F.col("id_a") < F.col("id_b")))
        .where(F.col("id_a") != F.col("id_b"))
        .select(F.least("id_a", "id_b").alias("id_a"),
                F.greatest("id_a", "id_b").alias("id_b"))
    )


def _band_split_buckets(mega: DataFrame, cfg: DedupConfig) -> DataFrame:
    """Re-bucket mega-bucket members with a finer (longer) band hash.

    Uses rows_per_band + band_split_extra_rows signature rows starting at
    the band's offset (slice clamps at the signature end). Emitted with a
    shifted band_id namespace so refined buckets never merge with
    originals.
    """
    r, extra = cfg.rows_per_band, cfg.band_split_extra_rows
    return mega.select(
        (F.col("band_id") + F.lit(cfg.bands)).alias("band_id"),
        F.xxhash64(
            F.slice(F.col("signature"), F.col("band_id") * r + 1, r + extra),
            F.col("band_id"),
        ).alias("bucket_hash"),
        "id",
    )


def candidate_pairs(signatures: DataFrame, cfg: DedupConfig) -> DataFrame:
    """LSH candidate pairs (id_a, id_b), skew-aware, exactly-once.

    Returns distinct canonical pairs. The union of three strategies by
    bucket class; `distinct()` collapses pairs found by several bands
    (it is the compute-once tie-break F1 of the reference in shuffle
    form).
    """
    buckets = lsh_buckets(signatures, cfg)
    stats = bucket_stats(buckets)
    classed = buckets.join(stats, ["band_id", "bucket_hash"])

    c0, c1 = cfg.salt_threshold_c0, cfg.band_split_c1

    normal = classed.where(
        (F.col("bucket_size") > 1) & (F.col("bucket_size") <= c0))
    hot = classed.where(
        (F.col("bucket_size") > c0) & (F.col("bucket_size") <= c1))
    mega = classed.where(F.col("bucket_size") > c1)

    pairs = _pairs_from_buckets(normal).unionByName(
        _salted_pairs(hot, cfg.salt_factor))

    # refined mega buckets: size-1 refined buckets drop out naturally in
    # the self-join; genuinely identical texts still pair because their
    # refined hashes agree on every row
    refined = _band_split_buckets(mega, cfg)
    refined_stats = refined.groupBy("band_id", "bucket_hash").agg(
        F.count("*").alias("bucket_size"))
    refined = refined.join(refined_stats, ["band_id", "bucket_hash"])
    refined_normal = refined.where(F.col("bucket_size") <= c0)
    refined_hot = refined.where(F.col("bucket_size") > c0)
    pairs = pairs.unionByName(_pairs_from_buckets(refined_normal))
    pairs = pairs.unionByName(_salted_pairs(refined_hot, cfg.salt_factor))

    return pairs.distinct()
