"""Corpus-curation operators: cluster canonicalization + decontamination.

Two operations every large-scale training-data pipeline needs *after*
near-duplicate detection (SURVEY.md §2 training-data ops; the reference
stops at pair/cluster output — ``src/main.cu`` writes metric pairs and
exits — these are the downstream consumers of that output):

* ``cluster_representatives`` — keep exactly one document per duplicate
  cluster (the highest-quality member), flag the rest for dropping.
* ``decontaminate`` — find training documents that contain a benchmark /
  eval document (shingle containment of the eval side), the standard
  benchmark-decontamination step before training.

Scale notes (100 TB):

* Representative selection is two partial-aggregatable passes keyed by
  ``cluster_id``: a ``max_by`` groupBy (map-side combine, no sort — a
  window ``row_number`` would sort every cluster partition) and one
  co-partitioned join back to the members. Duplicate clusters are tiny
  relative to the corpus, so both shuffles move only the clustered rows.
* Decontamination broadcasts the EVAL side: benchmarks are 10^3-10^6
  documents vs 10^9+ training docs, so the eval posting table (a few
  hundred MB at most) ships to executors and the 100-TB training side
  streams through a broadcast hash join with zero shuffle; only the
  surviving (train, eval) match counts shuffle for the pair groupBy.
  For an eval side too big to broadcast, drop to the same LSH candidate
  machinery as near-dup detection (operators/candidates.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from jaccard_ml_spark.functions import stable_round6
from jaccard_ml_spark.operators.setsim import posting_lists, set_sizes


def cluster_representatives(clusters: DataFrame,
                            quality: DataFrame) -> DataFrame:
    """Pick one representative per duplicate cluster; flag the rest.

    ``clusters``: (id, cluster_id) — e.g. ``dedup_documents(...).clusters``.
    ``quality``:  (doc_id, quality) — e.g. ``quality.quality_score(docs)``
    (quality pre-rounded to 6 dp so the argmax is reproducible across
    engines; ties break to the lowest doc_id).

    Returns (doc_id, cluster_id, rep_id, keep): every member row, its
    cluster's chosen representative, and keep = 1 iff the row IS the
    representative — the "drop list" is ``keep = 0``.

    The quality join is a LEFT join: a member with no quality row must
    still appear in the output (an inner join silently dropped it from
    BOTH the keep list and the drop list — for a dedup drop-list that
    means the doc is silently retained downstream, ADVICE r3). Null
    quality is treated as -inf, so an unscored member can never win
    the argmax away from a scored one.
    """
    members = (clusters.select(F.col("id").alias("doc_id"), "cluster_id")
               .join(quality.select("doc_id", "quality"), "doc_id", "left"))
    # max_by over (quality, -doc_id) == ORDER BY quality DESC, doc_id
    # ASC LIMIT 1, but partial-aggregatable: map-side combine instead of
    # a per-cluster sort.
    reps = members.groupBy("cluster_id").agg(
        F.max_by(
            "doc_id",
            F.struct(
                F.coalesce(F.col("quality"), F.lit(float("-inf"))),
                (-F.col("doc_id")).alias("_nid"),
            ),
        ).alias("rep_id"))
    return (members.join(reps, "cluster_id")
            .select(
                "doc_id",
                F.col("cluster_id").cast("long").alias("cluster_id"),
                F.col("rep_id").cast("long").alias("rep_id"),
                (F.col("doc_id") == F.col("rep_id"))
                .cast("long").alias("keep"),
            ))


def decontaminate(train_sets: DataFrame, eval_sets: DataFrame,
                  threshold: float = 0.5) -> DataFrame:
    """(train_id, eval_id) pairs where the eval doc leaks into training.

    Both inputs are (id, items) shingle-hash sets (the same
    representation every set operator here uses). Containment is
    asymmetric — |grams(eval) ∩ grams(train)| / |grams(eval)| — because
    decontamination asks "is the benchmark document inside this training
    document", regardless of how much other text the training doc has.

    The eval side is broadcast (see module docstring); the training side
    never shuffles before the match groupBy.
    """
    ev_post = posting_lists(eval_sets).select(
        F.col("id").alias("eval_id"), "item")
    ev_size = set_sizes(eval_sets).select(
        F.col("id").alias("eval_id"), F.col("set_size").alias("size_eval"))
    tr_post = posting_lists(train_sets).select(
        F.col("id").alias("train_id"), "item")

    inter = (tr_post.join(F.broadcast(ev_post), "item")
             .groupBy("train_id", "eval_id")
             .agg(F.count("*").alias("intersection")))
    return (inter.join(F.broadcast(ev_size), "eval_id")
            .withColumn("containment",
                        F.col("intersection") / F.col("size_eval"))
            .where(F.col("containment") >= threshold)
            .select(
                "train_id", "eval_id",
                F.col("intersection").cast("long").alias("intersection"),
                F.col("size_eval").cast("long").alias("size_eval"),
                stable_round6(F.col("containment")).alias("containment"),
            ))
