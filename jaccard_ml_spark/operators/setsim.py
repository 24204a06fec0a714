"""Exact pairwise set-similarity over a table of (id, items) sets.

This is the DataFrame form of the reference's set-intersection kernels
(SURVEY §2.3): semantically, every Jaccard kernel joins two sorted
neighbor lists and counts matches. Here the *posting-list self-join*
plays that role:

    explode(items) → (item, id) postings
    postings ⋈ postings ON item, id_a < id_b     (the compute-once
        tie-break of /root/reference/src/edge_metrics.cu:42-44, reborn
        as canonical pair ordering)
    groupBy(id_a, id_b) → count = |∩|            (partial+final agg —
        the warpReduce of /root/reference/src/gpu_utils.cu:59-65 is
        Spark's map-side combine)

Scale note: all-pairs posting joins are O(Σ df(item)²) and explode on hot
items — this operator is the *oracle / verify-everything* baseline (the
`.corr.bin` generator analog). The scale path generates candidates with
MinHash/LSH first (operators/candidates.py) and verifies only candidates
(operators/verify.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from jaccard_ml_spark.functions import metrics as M


def posting_lists(sets_df: DataFrame, id_col: str = "id",
                  items_col: str = "items") -> DataFrame:
    """(id, items array) → exploded (item, id) postings, deduplicated."""
    return (
        sets_df
        .select(F.col(id_col).alias("id"),
                F.explode(F.array_distinct(items_col)).alias("item"))
    )


def set_sizes(sets_df: DataFrame, id_col: str = "id",
              items_col: str = "items") -> DataFrame:
    return sets_df.select(
        F.col(id_col).alias("id"),
        F.size(F.array_distinct(items_col)).alias("set_size"),
    )


def size_window_filter(sets_df: DataFrame, lo: int, hi: int,
                       id_col: str = "id",
                       items_col: str = "items") -> DataFrame:
    """Keep sets whose cardinality lies in [lo, hi] — the reference's
    degree-window bin predicate (F2/F3: vertices are binned by degree
    range and each kernel processes one window,
    /root/reference/src/edge_metrics_binning.cu:45-63). As a pre-pair
    filter it is also the standard Jaccard size-ratio prune: J(A,B) ≥ t
    implies |A|/|B| ∈ [t, 1/t], so windowing the corpus before pairing
    discards pairs no threshold query could return. Pushed to the scan
    when ``items`` comes straight from parquet."""
    sz = F.size(F.array_distinct(items_col))
    return sets_df.where((sz >= F.lit(lo)) & (sz <= F.lit(hi)))


def pairwise_metrics(
    sets_df: DataFrame,
    id_col: str = "id",
    items_col: str = "items",
    metrics: tuple = M.METRIC_NAMES,
    min_intersection: int = 1,
) -> DataFrame:
    """All 7 reference metrics for every pair of sets sharing ≥1 item.

    Returns (id_a, id_b, intersection, size_a, size_b, <metrics...>),
    one row per unordered pair, id_a < id_b. Pairs with empty
    intersection are not emitted (the reference likewise only scores
    graph edges — pairs already known to touch).

    AA/RA document frequencies are computed from *this* collection:
    df(item) = number of sets containing item, which on symmetric
    adjacency sets equals the reference's deg(w) exactly.
    """
    post = posting_lists(sets_df, id_col, items_col)

    need_weighted = any(m in M.WEIGHTED_METRICS for m in metrics)
    if need_weighted:
        freq = post.groupBy("item").agg(F.count("*").alias("df"))
        post = post.join(freq, "item")

    a = post.select(F.col("id").alias("id_a"), "item",
                    *(["df"] if need_weighted else []))
    b = post.select(F.col("id").alias("id_b"), F.col("item").alias("item_b"))
    joined = a.join(b, (a.item == b.item_b) & (F.col("id_a") < F.col("id_b")))

    aggs = [F.count("*").alias("intersection")]
    if need_weighted:
        aggs += [
            F.sum(1.0 / F.log("df")).alias("_aa"),
            F.sum(1.0 / F.col("df")).alias("_ra"),
        ]
    inter = joined.groupBy("id_a", "id_b").agg(*aggs)
    if min_intersection > 1:
        inter = inter.where(F.col("intersection") >= min_intersection)

    sizes = set_sizes(sets_df, id_col, items_col)
    out = (
        inter
        .join(sizes.withColumnsRenamed(
            {"id": "id_a", "set_size": "size_a"}), "id_a")
        .join(sizes.withColumnsRenamed(
            {"id": "id_b", "set_size": "size_b"}), "id_b")
    )

    i, sa, sb = F.col("intersection"), F.col("size_a"), F.col("size_b")
    for m in metrics:
        if m == "adamic_adar":
            out = out.withColumn(m, F.col("_aa"))
        elif m == "resource_alloc":
            out = out.withColumn(m, F.col("_ra"))
        else:
            out = out.withColumn(m, M.SIZE_ONLY_METRICS[m](i, sa, sb))
    drop = [c for c in ("_aa", "_ra") if c in out.columns and
            "adamic_adar" not in metrics and "resource_alloc" not in metrics]
    return out.drop(*drop).select(
        "id_a", "id_b", "intersection", "size_a", "size_b", *metrics
    )


def exact_jaccard_pairs(
    sets_df: DataFrame,
    threshold: float,
    id_col: str = "id",
    items_col: str = "items",
) -> DataFrame:
    """All pairs with exact Jaccard ≥ threshold → (id_a, id_b, jaccard).

    Size-based pruning: a pair can only reach J ≥ t if
    |∩| ≥ t/(1+t) · (|A|+|B|), applied after the count (cheap) — and the
    posting join inherits Catalyst's sort-merge/broadcast choice (the
    reference's build-side selection J4 is automatic here).
    """
    post = posting_lists(sets_df, id_col, items_col)
    sizes = set_sizes(sets_df, id_col, items_col)

    a = post.select(F.col("id").alias("id_a"), "item")
    b = post.select(F.col("id").alias("id_b"), F.col("item").alias("item_b"))
    inter = (
        a.join(b, (a.item == b.item_b) & (F.col("id_a") < F.col("id_b")))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("intersection"))
    )
    out = (
        inter
        .join(sizes.withColumnsRenamed(
            {"id": "id_a", "set_size": "size_a"}), "id_a")
        .join(sizes.withColumnsRenamed(
            {"id": "id_b", "set_size": "size_b"}), "id_b")
        .withColumn(
            "jaccard",
            F.col("intersection")
            / (F.col("size_a") + F.col("size_b") - F.col("intersection")),
        )
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )
    return out
