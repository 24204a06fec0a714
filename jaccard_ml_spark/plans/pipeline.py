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
    shingle_sets: DataFrame    # id, items
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
                   cache: bool = True) -> DedupResult:
    """Run the full pipeline lazily; returns every intermediate stage.

    ``cache=True`` persists the two tables used more than once
    (shingle sets: verify + sizes; signatures: all bands).
    """
    conversations = assemble_conversations(transcripts, cfg.text_separator)
    sets_df = shingle_sets_from_conversations(conversations, cfg)
    if cache:
        sets_df = sets_df.persist()

    signatures = minhash_signatures(sets_df, cfg)
    cands = candidate_pairs(signatures, cfg)
    pairs = verify_pairs(cands, sets_df, cfg.jaccard_threshold)
    if cache:
        pairs = pairs.persist()

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
    """Same pipeline for a flat document table (no assembly stage)."""
    sets_df = _add_shingles(
        docs.select(F.col(id_col).alias("id"),
                    F.col(text_col).alias("text")),
        cfg).select("id", "items")
    if cache:
        sets_df = sets_df.persist()
    signatures = minhash_signatures(sets_df, cfg)
    cands = candidate_pairs(signatures, cfg)
    pairs = verify_pairs(cands, sets_df, cfg.jaccard_threshold)
    if cache:
        pairs = pairs.persist()
    comps = connected_components(pairs, cfg.cc_max_iterations)
    clusters = assign_clusters(sets_df, comps)
    return DedupResult(None, sets_df, signatures, cands, pairs, clusters)
