"""Incremental dedup: fold a new batch of transcripts into a standing
corpus without recomputing old×old work.

The idiom for 10^12-turn production: signatures and verified pairs are
Iceberg tables; each new snapshot of the transcripts table yields a
delta batch. Candidates are (new×new) ∪ (new×old) — old×old pairs are
already in the pair table. On Iceberg the signature upsert is a
``MERGE INTO`` on conv_id; here it is a unionByName with
last-writer-wins dedup, same semantics.

Cost model: |new| band rows join the standing bucket table; with the
bucket table clustered by (band_id, bucket_hash) the join prunes to
touched buckets only — incremental work scales with the batch, not the
corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from jaccard_ml_spark.config import DedupConfig
from jaccard_ml_spark.operators.assemble import assemble_conversations
from jaccard_ml_spark.operators.candidates import (
    lsh_buckets,
    minhash_signatures,
)
from jaccard_ml_spark.operators.cluster import (
    assign_clusters,
    connected_components,
)
from jaccard_ml_spark.operators.verify import verify_pairs
from jaccard_ml_spark.plans.pipeline import shingle_sets_from_conversations


def incremental_dedup(
    new_transcripts: DataFrame,
    prior_sets: DataFrame | None,
    prior_pairs: DataFrame | None,
    cfg: DedupConfig,
) -> dict[str, DataFrame]:
    """Process a delta batch against the standing corpus.

    Returns updated {"sets", "pairs", "clusters"} DataFrames. With
    prior_* = None this degenerates to the batch pipeline.
    """
    conv = assemble_conversations(new_transcripts, cfg.text_separator)
    new_sets = shingle_sets_from_conversations(conv, cfg)

    if prior_sets is None:
        all_sets = new_sets
    else:
        # MERGE INTO semantics: new conv_ids replace old rows
        all_sets = prior_sets.join(
            new_sets.select("id"), "id", "left_anti"
        ).unionByName(new_sets)

    new_sigs = minhash_signatures(new_sets, cfg)
    new_buckets = lsh_buckets(new_sigs, cfg).select(
        "band_id", "bucket_hash", "id")

    # new×new
    nn = (
        new_buckets.alias("a")
        .join(new_buckets.alias("b"), ["band_id", "bucket_hash"])
        .where(F.col("a.id") < F.col("b.id"))
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
    )
    cands = nn
    if prior_sets is not None:
        old_sigs = minhash_signatures(
            prior_sets.join(new_sets.select("id"), "id", "left_anti"), cfg)
        old_buckets = lsh_buckets(old_sigs, cfg).select(
            "band_id", "bucket_hash", "id")
        # new×old (both orientations canonicalized)
        no = (
            new_buckets.alias("n")
            .join(old_buckets.alias("o"), ["band_id", "bucket_hash"])
            .select(
                F.least(F.col("n.id"), F.col("o.id")).alias("id_a"),
                F.greatest(F.col("n.id"), F.col("o.id")).alias("id_b"),
            )
            .where(F.col("id_a") != F.col("id_b"))
        )
        cands = cands.unionByName(no)

    new_pairs = verify_pairs(cands.distinct(), all_sets,
                             cfg.jaccard_threshold)
    pairs = new_pairs if prior_pairs is None else (
        prior_pairs.select("id_a", "id_b", "intersection", "size_a",
                           "size_b", "jaccard")
        .unionByName(new_pairs)
        .dropDuplicates(["id_a", "id_b"])
    )

    comps = connected_components(pairs, cfg.cc_max_iterations)
    clusters = assign_clusters(all_sets, comps)
    return {"sets": all_sets, "pairs": pairs, "clusters": clusters}
