"""Incremental dedup: fold a new batch of transcripts into a standing
corpus without recomputing old×old work.

The idiom for 10^12-turn production: sets, signatures and verified
pairs are Iceberg tables; each new snapshot of the transcripts table
yields a delta batch. Candidates are (new×new) ∪ (new×old) — old×old
pairs are already in the pair table. On Iceberg the upserts are
``MERGE INTO`` on conv_id; here they are unionByName with
anti-join-first semantics (deterministic: the new batch always wins).

Cost model: the old side is READ, never recomputed — ``prior_sigs`` is
the standing signature table maintained across batches (returned as
``sigs`` each call), so no MinHash UDF runs over prior-corpus rows;
|new| band rows join the standing bucket table; with the bucket table
clustered by (band_id, bucket_hash) the join prunes to touched buckets
only — incremental work scales with the batch, not the corpus.

Stale-pair invalidation: when a delta batch REPLACES an existing
conv_id, every prior pair touching an updated id is dropped before the
union — its Jaccard was computed against the old text and may have
fallen below threshold (keeping it would wrongly cluster the updated
doc). Those ids' live pairs are re-derived from the new candidates, so
the drop loses nothing. prior pairs ∩ new pairs = ∅ by construction
(every new candidate touches a new id), making the union winner
deterministic without a dropDuplicates tie-break.
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
    prior_sigs: DataFrame | None = None,
) -> dict[str, DataFrame]:
    """Process a delta batch against the standing corpus.

    ``prior_sigs`` is the standing (id, set_size, signature) table from
    the previous call's ``sigs`` output (an Iceberg checkpoint table in
    production). When provided, the old side is read — the MinHash UDF
    runs over the NEW batch only (asserted by plan inspection in
    tests/test_suffix_and_incremental.py). Without it (first call, or
    legacy callers) old signatures are computed from prior_sets once.

    Returns updated {"sets", "sigs", "pairs", "clusters"}. With
    prior_* = None this degenerates to the batch pipeline.
    """
    conv = assemble_conversations(new_transcripts, cfg.text_separator)
    # persist the delta tables: they feed 5+ plan branches (merge
    # anti-joins, bucket join, verify, stale-pair invalidation) and
    # Catalyst performs no CSE across branches — unpersisted, the
    # shingle/MinHash UDFs would re-run over the batch once per branch
    new_sets = shingle_sets_from_conversations(conv, cfg).persist()
    new_ids = new_sets.select("id")
    new_sigs = minhash_signatures(new_sets, cfg).persist()

    if prior_sets is None:
        all_sets = new_sets
        all_sigs = new_sigs
        old_buckets = None
    else:
        # MERGE INTO semantics: new conv_ids replace old rows
        surviving_old_sets = prior_sets.join(new_ids, "id", "left_anti")
        all_sets = surviving_old_sets.unionByName(new_sets)
        if prior_sigs is not None:
            old_sigs = prior_sigs.join(new_ids, "id", "left_anti")
        else:
            old_sigs = minhash_signatures(surviving_old_sets, cfg)
        all_sigs = old_sigs.unionByName(new_sigs)
        old_buckets = lsh_buckets(old_sigs, cfg).select(
            "band_id", "bucket_hash", "id")

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
    if old_buckets is not None:
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
    if prior_pairs is None:
        pairs = new_pairs
    else:
        # drop every prior pair touching an updated id (stale Jaccard),
        # then union — disjoint, so no tie-break needed
        surviving_prior = (
            prior_pairs.select("id_a", "id_b", "intersection", "size_a",
                               "size_b", "jaccard")
            .join(new_ids.withColumnRenamed("id", "id_a"), "id_a",
                  "left_anti")
            .join(new_ids.withColumnRenamed("id", "id_b"), "id_b",
                  "left_anti")
        )
        pairs = surviving_prior.unionByName(new_pairs)

    comps = connected_components(pairs, cfg.cc_max_iterations)
    clusters = assign_clusters(all_sets, comps)
    return {"sets": all_sets, "sigs": all_sigs, "pairs": pairs,
            "clusters": clusters}
