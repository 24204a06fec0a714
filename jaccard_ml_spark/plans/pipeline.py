"""The end-to-end near-duplicate pipeline.

    transcripts → assemble → shingle-hash sets → MinHash signatures
    → LSH candidates (skew-aware) → exact-Jaccard verify → threshold
    → connected components → cluster assignments

Shuffle census at scale (SURVEY §3.4): (1) groupBy conv_id for assembly,
(2) band-bucket exchange, (3) candidate distinct, (4+5) verify joins on
id_a/id_b, (6..6+2k) CC rounds. Shingling, MinHash and band hashing are
shuffle-free map stages.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from jaccard_ml_spark.config import DedupConfig
from jaccard_ml_spark.functions.shingle_arrow import (
    add_shingle_hash_sets_arrow,
)
from jaccard_ml_spark.functions.text import add_shingle_hash_sets
from jaccard_ml_spark.operators.assemble import assemble_conversations
from jaccard_ml_spark.operators.candidates import (
    candidate_pairs,
    minhash_signatures,
)
from jaccard_ml_spark.operators.cluster import (
    assign_clusters,
    connected_components,
)
from jaccard_ml_spark.operators.verify import verify_pairs


@dataclass
class DedupResult:
    conversations: DataFrame   # conv_id, n_turns, turns, text
    shingle_sets: DataFrame    # id, items (+ set_size, signature on the
                               # fused arrow path — it IS the cache)
    signatures: DataFrame      # id, set_size, signature
    candidates: DataFrame      # id_a, id_b
    pairs: DataFrame           # id_a, id_b, intersection, sizes, jaccard
    clusters: DataFrame        # id, cluster_id


def _add_shingles(df: DataFrame, cfg: DedupConfig) -> DataFrame:
    if cfg.shingle_impl == "arrow":
        return add_shingle_hash_sets_arrow(df, "text", cfg.k_shingle)
    return add_shingle_hash_sets(df, "text", cfg.k_shingle)


def shingle_sets_from_conversations(conversations: DataFrame,
                                    cfg: DedupConfig) -> DataFrame:
    base = conversations.select(F.col("conv_id").alias("id"), "text")
    return _add_shingles(base, cfg).select("id", "items")


def dedup_pipeline(transcripts: DataFrame, cfg: DedupConfig,
                   cache: bool = True,
                   storage_level=None,
                   sets_store=None,
                   sets_buckets: int | None = None) -> DedupResult:
    """Run the full pipeline lazily; returns every intermediate stage.

    ``cache=True`` persists the tables used more than once.
    ``storage_level`` overrides EVERY persist tier in the pipeline,
    including the candidate fan-out table inside ``candidate_pairs``
    (default: Spark's MEMORY_AND_DISK). Pass
    ``pyspark.StorageLevel.DISK_ONLY`` when the deserialized caches
    exceed executor memory at the smallest cluster size under
    comparison: a cache that is memory-resident at one cluster size
    and disk-spilled at another measures storage-tier asymmetry, not
    compute scaling (BENCH/scaling.py) — pinning everything to one
    tier keeps per-byte decode cost identical per task.

    On the Arrow path (``cfg.shingle_impl == "arrow"``, the default)
    shingling and MinHash run as ONE fused Arrow pass and ONE persist:
    the cached table carries (id, items, set_size, signature), so the
    element arrays — the widest column — cross the JVM↔Python boundary
    once instead of twice, and the signature column needs no second
    cache inside candidate_pairs (functions/shingle_arrow.py:
    fused_shingle_minhash for the bandwidth arithmetic).
    ``shingle_sets`` in the result IS that cached table (callers
    unpersist it); its items/signature values are bit-identical to the
    two-step path by shared-kernel construction.

    ``cache=False`` on the Arrow path falls back to the TWO-STEP
    formulation (separate shingle + MinHash UDF passes, bit-identical
    outputs by shared kernels): an unpersisted fused table would feed
    verify's two join sides and assign_clusters, re-running shingle AND
    MinHash once per consumer, where the two-step uncached plan re-runs
    only the shingle UDF for the verify sides (the fused pass exists to
    save a JVM↔Python round trip, which only pays off when its output
    is materialized exactly once).

    ``sets_store`` (a ``plans.checkpoint.CheckpointStore``) replaces
    the in-memory persist of the fused sets table with a CHECKPOINT
    bucketed+sorted by id (``write_bucketed``; on Iceberg:
    ``bucket(N, id)`` partition transform + sort order) of
    ``sets_buckets`` buckets (default: the session's shuffle-partition
    count, so the slim pair side co-partitions with the buckets
    without a second exchange). Every downstream consumer then reads
    the bucketed table in place of the cache: verify's two sort-merge
    joins on id_a/id_b read the FAT side (the shingle arrays — the
    widest rows in the pipeline) WITHOUT an exchange, as do the
    mega-bucket signature join and the final cluster assignment —
    only the slim pair side shuffles. The checkpoint write replaces
    the cache materialization byte-for-byte (same columns, same
    moment), so the trade is: +1 bucketed parquet write of the fused
    table, −2 full exchanges of it. Construction becomes EAGER (the
    checkpoint is written when this function runs). This is the
    production verify layout flagged in operators/verify.py:49-51 and
    SURVEY §P8 (reference analog: the degree-sort data layout pass,
    /root/reference/src/utils.cuh:406-492).
    """
    conversations = assemble_conversations(transcripts, cfg.text_separator)
    if sets_store is not None and cfg.shingle_impl != "arrow":
        # the bucketed-checkpoint layout is built from the fused Arrow
        # table; silently falling through to the unbucketed persist
        # would hand the caller an A/B that never ran the B variant
        raise ValueError(
            "sets_store requires cfg.shingle_impl='arrow' "
            f"(got {cfg.shingle_impl!r})")
    if cfg.shingle_impl == "arrow" and sets_store is not None:
        from jaccard_ml_spark.functions.shingle_arrow import (
            fused_shingle_minhash,
        )
        fused = fused_shingle_minhash(
            conversations.select(F.col("conv_id").alias("id"), "text"),
            "text", cfg.k_shingle, cfg.num_perm, cfg.minhash_seed)
        n_buckets = sets_buckets or int(
            sets_store.spark.conf.get("spark.sql.shuffle.partitions"))
        sets_df = sets_store.write_bucketed(
            "fused_sets", fused, ["id"], n_buckets=n_buckets,
            sort_cols=["id"])
        signatures = (sets_df.select("id", "set_size", "signature")
                      .where(F.col("signature").isNotNull()))
        # the checkpoint IS the materialization: scans of it never
        # re-run the UDF, so candidate_pairs must not re-persist
        sigs_cached = True
    elif cfg.shingle_impl == "arrow" and cache:
        from jaccard_ml_spark.functions.shingle_arrow import (
            fused_shingle_minhash,
        )
        fused = fused_shingle_minhash(
            conversations.select(F.col("conv_id").alias("id"), "text"),
            "text", cfg.k_shingle, cfg.num_perm, cfg.minhash_seed)
        fused = (fused.persist(storage_level) if storage_level
                 else fused.persist())
        sets_df = fused
        signatures = (fused.select("id", "set_size", "signature")
                      .where(F.col("signature").isNotNull()))
        sigs_cached = cache
    else:
        sets_df = shingle_sets_from_conversations(conversations, cfg)
        if cache:
            sets_df = (sets_df.persist(storage_level) if storage_level
                       else sets_df.persist())
        signatures = minhash_signatures(sets_df, cfg)
        sigs_cached = False

    cands = candidate_pairs(signatures, cfg,
                            signatures_persisted=sigs_cached,
                            storage_level=storage_level)
    pairs = verify_pairs(cands, sets_df, cfg.jaccard_threshold,
                         semi_filter=cfg.verify_semi_filter,
                         persist_level=storage_level)
    if cache:
        pairs = (pairs.persist(storage_level) if storage_level
                 else pairs.persist())

    comps = connected_components(pairs, cfg.cc_max_iterations)
    clusters = assign_clusters(sets_df, comps)

    return DedupResult(
        conversations=conversations,
        shingle_sets=sets_df,
        signatures=signatures,
        candidates=cands,
        pairs=pairs,
        clusters=clusters,
    )


def dedup_documents(docs: DataFrame, cfg: DedupConfig,
                    id_col: str = "doc_id", text_col: str = "text",
                    cache: bool = True) -> DedupResult:
    """Same pipeline for a flat document table (no assembly stage).

    Like ``dedup_pipeline``, ``cache=False`` drops the fused Arrow pass
    back to the two-step formulation — an unpersisted fused table would
    re-run BOTH UDF kernels once per downstream consumer.
    """
    base = docs.select(F.col(id_col).alias("id"),
                       F.col(text_col).alias("text"))
    if cfg.shingle_impl == "arrow" and cache:
        from jaccard_ml_spark.functions.shingle_arrow import (
            fused_shingle_minhash,
        )
        sets_df = fused_shingle_minhash(base, "text", cfg.k_shingle,
                                        cfg.num_perm, cfg.minhash_seed)
        sets_df = sets_df.persist()   # branch is gated on cache above
        signatures = (sets_df.select("id", "set_size", "signature")
                      .where(F.col("signature").isNotNull()))
        sigs_cached = True
    else:
        sets_df = _add_shingles(base, cfg).select("id", "items")
        if cache:
            sets_df = sets_df.persist()
        signatures = minhash_signatures(sets_df, cfg)
        sigs_cached = False
    cands = candidate_pairs(signatures, cfg,
                            signatures_persisted=sigs_cached)
    pairs = verify_pairs(cands, sets_df, cfg.jaccard_threshold,
                         semi_filter=cfg.verify_semi_filter)
    if cache:
        pairs = pairs.persist()
    comps = connected_components(pairs, cfg.cc_max_iterations)
    clusters = assign_clusters(sets_df, comps)
    return DedupResult(None, sets_df, signatures, cands, pairs, clusters)
