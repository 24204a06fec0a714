"""Connected components via alternating large-star / small-star joins.

Kiveris et al. 2014, "Connected Components in MapReduce and Beyond" —
the standard O(log² n)-round distributed CC. Pure DataFrame joins and
aggregations; the driver loop only counts a convergence metric per
round (the reference's fixpoint analog is its golden-file equality;
ours is "no edge changed").

Lineage control: every iteration ends in ``localCheckpoint`` so the
plan does not grow unboundedly (SURVEY §7.4.1 — the hard part). On a
production cluster each round instead writes/reads an Iceberg
checkpoint table (plans/checkpoint.py), which also gives resume.

cluster_id = min member id (lexicographic for string conv_ids), the
FIXTURES.md truth convention.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _large_star(edges: DataFrame) -> DataFrame:
    """Connect every neighbor larger than u to u's min neighborhood id."""
    nbrs = edges.unionByName(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    grouped = nbrs.groupBy("src").agg(
        F.min("dst").alias("_min_nbr"),
        F.collect_set("dst").alias("_nbrs"),
    )
    grouped = grouped.withColumn(
        "m", F.least(F.col("_min_nbr"), F.col("src")))
    out = grouped.select(
        F.explode("_nbrs").alias("v"), "src", "m"
    ).where(F.col("v") > F.col("src")).select(
        F.col("v").alias("src"), F.col("m").alias("dst"))
    return out.where(F.col("src") != F.col("dst"))


def _small_star(edges: DataFrame) -> DataFrame:
    """Within each node's ≤-neighborhood, connect all to the minimum."""
    # orient edges so src > dst (parent pointers), group by child? —
    # canonical formulation: consider u with neighbors v ≤ u
    oriented = edges.select(
        F.greatest("src", "dst").alias("src"),
        F.least("src", "dst").alias("dst"),
    ).where(F.col("src") != F.col("dst"))
    grouped = oriented.groupBy("src").agg(
        F.min("dst").alias("m"),
        F.collect_set("dst").alias("_nbrs"),
    )
    out = grouped.select(
        "src", "m", F.explode("_nbrs").alias("v")
    )
    pairs = out.select(F.col("v").alias("src"), F.col("m").alias("dst")) \
        .unionByName(out.select(F.col("src"), F.col("m").alias("dst")))
    return pairs.where(F.col("src") != F.col("dst")).distinct()


def connected_components(
    pairs: DataFrame,
    max_iterations: int = 50,
    id_a: str = "id_a",
    id_b: str = "id_b",
    star_rounds_per_check: int = 2,
    driver_cc_max_edges: int = 5_000_000,
    driver_cc_max_bytes: int = 1 << 30,
) -> DataFrame:
    """(id_a, id_b) edges → (id, cluster_id) for every id in the edges.

    Nodes not present in any edge are absent — callers left-join the
    full id universe and coalesce(cluster_id, id) for singletons.

    Hybrid execution (the standard small-graph shortcut, cf.
    GraphFrames' aggregate-message CC falling back to local runs):
    below ``driver_cc_max_edges`` (and ``driver_cc_max_bytes``, byte-
    estimated from the measured id width) the edge list is downloaded
    as Arrow batches and solved with vectorized numpy min-label
    propagation — identical output, no iterative shuffle rounds, no
    per-edge Python. The near-dup edge set is the DUPLICATE
    graph (orders of magnitude smaller than the corpus), so even
    trillion-turn runs often fit; above the bound the distributed
    small-star/large-star loop runs. Set 0 to force distributed.

    ``star_rounds_per_check``: large+small-star rounds folded into one
    checkpoint + convergence check. Each check is two blocking driver
    round-trips; near-dup cluster graphs converge in a handful of star
    rounds, so checking every round makes the loop latency-bound at
    bench scale (and adds an Iceberg snapshot per round on a cluster).
    Two rounds per check halves the barrier count; the cost — at most
    one extra (idempotent) round after the fixpoint — is one cheap
    no-op job. Convergence detection is unaffected: star operations
    are idempotent at the fixpoint, so the signature is stable exactly
    when the true fixpoint is reached.
    """
    edges = (
        pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
        .where(F.col("src") != F.col("dst"))
        .distinct()
        .localCheckpoint()
    )

    # one job for both hybrid criteria: edge count AND an estimate of
    # the driver-side footprint (an edge cap alone is not byte-safe for
    # long ids). The numpy path below holds ids in pandas object
    # arrays: ~60-70 B of CPython str overhead per id occurrence plus
    # the label arrays — ~120 B + id bytes per edge end.
    stats = edges.select(
        F.count("*").alias("n"),
        F.coalesce(F.avg(F.length(F.col("src").cast("string"))
                         + F.length(F.col("dst").cast("string"))),
                   F.lit(0.0)).alias("avg_len"),
    ).first()
    n_edges = stats.n
    est_driver_bytes = int(n_edges * (stats.avg_len + 120) * 2)
    spark = pairs.sparkSession
    from pyspark.sql import types as T
    id_type = edges.schema["src"].dataType
    schema = T.StructType([T.StructField("id", id_type),
                           T.StructField("cluster_id", id_type)])
    if n_edges <= driver_cc_max_edges and \
            est_driver_bytes <= driver_cc_max_bytes:
        # Arrow download (toPandas) + vectorized min-label propagation
        # with pointer jumping + Arrow upload. The previous
        # Row-collect + per-edge Python union-find was ~20s of pure
        # serial driver time at 10⁶ edges — a fixed cost that dominates
        # the scaling-efficiency denominator at every cluster size.
        # np.unique's SORTED uniques make numeric-min == lexicographic-
        # min id, preserving the cluster_id = min-member convention.
        import numpy as np
        import pandas as pd

        pdf = edges.toPandas()
        if len(pdf) == 0:
            return spark.createDataFrame([], schema)
        both = np.concatenate([pdf["src"].to_numpy(),
                               pdf["dst"].to_numpy()])
        uniques, codes = np.unique(both, return_inverse=True)
        m = len(pdf)
        a, b = codes[:m], codes[m:]
        lab = np.arange(len(uniques), dtype=np.int64)
        while True:
            prev = lab
            lab = lab.copy()
            # propagate the smaller label across every edge, both
            # directions, then compress chains (pointer jumping) —
            # labels are monotone non-increasing node indices, so the
            # fixpoint (all edges label-equal) is the component minimum.
            # The sort-reduce alternative (group edge ends by target
            # once, np.minimum.reduceat per pass) was measured 6x
            # SLOWER at 5M random edges / 2M nodes (95s vs 16s): it
            # reads the label snapshot (Jacobi), so it needed 12 passes
            # where .at's cascading in-pass updates converge in ~4, and
            # each of its passes still pays a 2m-element random gather.
            # The unbuffered .at ufunc is the right kernel here.
            np.minimum.at(lab, a, lab[b])
            np.minimum.at(lab, b, lab[a])
            lab = lab[lab]
            if (lab == prev).all():
                break
        out = pd.DataFrame({"id": uniques, "cluster_id": uniques[lab]})
        return spark.createDataFrame(out, schema)

    def _signature(e) -> tuple:
        """One job: (count, sum of canonical-edge hashes). Stability of
        this pair is the fixpoint test — replaces the exceptAll shuffle
        with a single aggregate (order-independent, collision-safe in
        practice at 64 bits)."""
        h = F.xxhash64(F.greatest("src", "dst"), F.least("src", "dst"))
        row = e.select(
            F.count("*").alias("n"),
            F.bit_xor(h).alias("x"),
            F.sum(F.pmod(h, F.lit(1_000_000_007))).alias("m"),
        ).first()
        return (row.n, row.x, row.m)

    sig = _signature(edges)
    for _ in range(max_iterations):
        stepped = edges
        for _r in range(star_rounds_per_check):
            stepped = _small_star(_large_star(stepped))
        edges = stepped.localCheckpoint()
        new_sig = _signature(edges)
        if new_sig == sig:
            break
        sig = new_sig

    # at fixpoint every edge is (member, root)
    members = edges.select(F.col("src").alias("id"),
                           F.col("dst").alias("cluster_id"))
    roots = edges.select(F.col("dst").alias("id"),
                         F.col("dst").alias("cluster_id"))
    return members.unionByName(roots).groupBy("id").agg(
        F.min("cluster_id").alias("cluster_id"))


def assign_clusters(all_ids: DataFrame, components: DataFrame,
                    id_col: str = "id") -> DataFrame:
    """Every id gets a cluster: component root or itself (singleton)."""
    ids = all_ids.select(F.col(id_col).alias("id")).distinct()
    return (
        ids.join(components, "id", "left")
        .select("id", F.coalesce("cluster_id", "id").alias("cluster_id"))
    )
