"""Similarity search over embedding columns.

Brute-force cosine top-k as the exactness baseline; random-hyperplane
(sign-LSH) bucketing as the scale path — the same candidates-then-verify
architecture as the MinHash text path. Hyperplanes are generated from a
seeded RNG on the driver and broadcast as literal arrays (64 dims ×
n_planes doubles — trivially broadcastable at any scale).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from jaccard_ml_spark.functions import stable_round6
from jaccard_ml_spark.functions.embeddings import cosine, dot, norm


def cosine_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k neighbors by cosine for each query vector.

    (query_id, neighbor_id, cosine, rank). Self-matches excluded.
    Cosine rounded to 6 dp *before* ranking so ranks are reproducible
    bit-for-bit across engines; ties broken by neighbor id.

    Scale: broadcast the (small) query set against the corpus —
    a broadcast-nested-loop the optimizer handles; for large query sets
    use ann_buckets + verify instead.
    """
    q = queries.select(F.col(id_col).alias("query_id"),
                       F.col(vec_col).alias("_qv"))
    c = corpus.select(F.col(id_col).alias("neighbor_id"),
                      F.col(vec_col).alias("_cv"))
    scored = (
        F.broadcast(q).crossJoin(c)
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id", "neighbor_id",
            stable_round6(cosine(F.col("_qv"), F.col("_cv"))).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine",
                F.col("rank").cast("long").alias("rank"))
    )


def cosine_dup_pairs(
    vectors: DataFrame,
    threshold: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact embedding near-duplicate pairs: cosine ≥ threshold.

    All-pairs exact (the embedding analog of setsim.exact_jaccard_pairs
    — the oracle/baseline path; ann_topk is the approximate scale path).
    Norms are precomputed per vector so the cross join multiplies
    normalized vectors only.
    """
    v = vectors.select(
        F.col(id_col).alias("_id"),
        F.col(vec_col).alias("_v"),
    ).withColumn("_n", norm(F.col("_v")))
    a = v.select(F.col("_id").alias("id_a"), F.col("_v").alias("_va"),
                 F.col("_n").alias("_na"))
    b = v.select(F.col("_id").alias("id_b"), F.col("_v").alias("_vb"),
                 F.col("_n").alias("_nb"))
    return (
        a.crossJoin(b)
        .where(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a", "id_b",
            stable_round6(dot(F.col("_va"), F.col("_vb"))
                          / (F.col("_na") * F.col("_nb"))).alias("cosine"),
        )
        .where(F.col("cosine") >= threshold)
    )


def hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim)).tolist()


def ann_buckets(
    vectors: DataFrame,
    dim: int,
    n_planes: int = 16,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Sign-LSH bucket per vector: bit p = [v·h_p > 0] packed to a long.

    Vectors in the same bucket are cosine-similar candidates; pair
    within buckets (reusing candidates.py's skew machinery) and verify
    with exact cosine.
    """
    planes = hyperplanes(dim, n_planes, seed)
    bits = [
        F.when(dot(F.col(vec_col), F.array(*[F.lit(x) for x in plane])) > 0,
               F.lit(1).cast("long")).otherwise(F.lit(0).cast("long"))
        * F.lit(2 ** p).cast("long")
        for p, plane in enumerate(planes)
    ]
    bucket = bits[0]
    for b in bits[1:]:
        bucket = bucket + b
    return vectors.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("embedding"),
        bucket.alias("bucket"),
    )


def ann_topk(
    vectors: DataFrame,
    dim: int,
    k: int = 5,
    n_planes: int = 4,
    n_tables: int = 8,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate all-pairs top-k: union of per-table sign-LSH buckets
    → within-bucket pairing → exact cosine → per-id top-k.

    Multiple hash tables recover recall the way extra LSH bands do for
    MinHash (same 1-(1-p^r)^b trade). Plane/table counts are the
    recall-vs-candidates knob and MUST be tuned to the corpus's angle
    distribution: clustered real-world embeddings tolerate 8-16 planes;
    near-uniform vectors (neighbor angles 60°+) need few planes — at
    cos≈0.5 a plane agrees with p≈0.67, so 4 planes × 8 tables gives
    recall ≈ 1-(1-0.67^4)^8 ≈ 0.83 while 12 planes gives ≈ 1%.
    """
    tables = []
    for t in range(n_tables):
        b = ann_buckets(vectors, dim, n_planes, seed + 97 * t,
                        id_col, vec_col).withColumn("table", F.lit(t))
        tables.append(b.select("table", "bucket", "id"))
    buckets = tables[0]
    for t in tables[1:]:
        buckets = buckets.unionByName(t)

    left = buckets.select("table", "bucket", F.col("id").alias("id_a"))
    right = buckets.select("table", "bucket", F.col("id").alias("id_b"))
    cand = (
        left.join(right, ["table", "bucket"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b").distinct()
    )
    vecs = vectors.select(F.col(id_col).alias("_id"),
                          F.col(vec_col).alias("_v"))
    scored = (
        cand
        .join(vecs.withColumnsRenamed({"_id": "id_a", "_v": "_va"}), "id_a")
        .join(vecs.withColumnsRenamed({"_id": "id_b", "_v": "_vb"}), "id_b")
        .select("id_a", "id_b",
                stable_round6(cosine(F.col("_va"), F.col("_vb")))
                .alias("cosine"))
    )
    sym = scored.unionByName(scored.select(
        F.col("id_b").alias("id_a"), F.col("id_a").alias("id_b"), "cosine"))
    w = Window.partitionBy("id_a").orderBy(F.desc("cosine"), F.asc("id_b"))
    return (
        sym.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(F.col("id_a").alias("query_id"),
                F.col("id_b").alias("neighbor_id"), "cosine",
                F.col("rank").cast("long").alias("rank"))
    )


def kmeans_centroids(sample: np.ndarray, k: int, iters: int = 10,
                     seed: int = 42) -> np.ndarray:
    """Deterministic Lloyd's k-means on a driver-side sample (numpy).

    The coarse quantizer for IVF: tiny (k × dim floats), broadcast as
    literals. Seeded initialization + fixed iteration count → identical
    centroids on every run and at any parallelism.
    """
    rng = np.random.default_rng(seed)
    idx = rng.choice(len(sample), size=min(k, len(sample)), replace=False)
    cents = sample[np.sort(idx)].astype(np.float64)
    for _ in range(iters):
        d = ((sample[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        assign = d.argmin(axis=1)
        for c in range(len(cents)):
            members = sample[assign == c]
            if len(members):
                cents[c] = members.mean(axis=0)
    return cents


def ivf_assign(vectors: DataFrame, centroids: np.ndarray,
               nprobe: int = 2, id_col: str = "vec_id",
               vec_col: str = "embedding") -> DataFrame:
    """(id, cell) assignment for IVF: each vector lands in its nearest
    `nprobe` centroid cells (probing > 1 cell recovers neighbors that
    straddle a cell boundary — the recall knob).

    Distance to each centroid is a JVM expression over literal arrays:
    ||v - c||² = ||v||² - 2·v·c + ||c||², and since ||v||² is shared,
    ranking by (||c||² - 2·v·c) suffices — one dot product per cell.
    """
    scores = F.array(*[
        F.struct(
            (F.lit(float((c * c).sum()))
             - 2.0 * dot(F.col(vec_col), F.array(*[F.lit(float(x))
                                                   for x in c])))
            .alias("score"),
            F.lit(i).alias("cell"),
        )
        for i, c in enumerate(centroids)
    ])
    probed = F.slice(F.array_sort(scores), 1, nprobe)
    return vectors.select(
        F.col(id_col).alias("id"),
        F.explode(F.transform(probed, lambda s: s["cell"])).alias("cell"),
    )


def ivf_topk(
    vectors: DataFrame,
    dim: int,
    k: int = 5,
    n_cells: int = 16,
    nprobe: int = 2,
    sample_size: int = 2048,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF approximate all-pairs top-k: coarse-quantize into cells,
    pair within probed cells, exact cosine, per-id top-k.

    The IVF counterpart of ann_topk (sign-LSH): cells come from a
    seeded k-means over a deterministic sample (vec_id order, not
    random split — reproducible). At corpus scale the sample is a
    `LIMIT sample_size` over a hash-ordered projection.
    """
    sample_rows = (vectors.select(vec_col)
                   .orderBy(F.xxhash64(F.col(id_col)))
                   .limit(sample_size).collect())
    sample = np.array([list(r[0]) for r in sample_rows], dtype=np.float64)
    cents = kmeans_centroids(sample, n_cells, seed=seed)

    assigned = ivf_assign(vectors, cents, nprobe, id_col, vec_col)
    left = assigned.select("cell", F.col("id").alias("id_a"))
    right = assigned.select("cell", F.col("id").alias("id_b"))
    cand = (left.join(right, "cell")
            .where(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b").distinct())

    vecs = vectors.select(F.col(id_col).alias("_id"),
                          F.col(vec_col).alias("_v"))
    scored = (
        cand
        .join(vecs.withColumnsRenamed({"_id": "id_a", "_v": "_va"}), "id_a")
        .join(vecs.withColumnsRenamed({"_id": "id_b", "_v": "_vb"}), "id_b")
        .select("id_a", "id_b",
                stable_round6(cosine(F.col("_va"), F.col("_vb")))
                .alias("cosine"))
    )
    sym = scored.unionByName(scored.select(
        F.col("id_b").alias("id_a"), F.col("id_a").alias("id_b"), "cosine"))
    w = Window.partitionBy("id_a").orderBy(F.desc("cosine"), F.asc("id_b"))
    return (
        sym.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(F.col("id_a").alias("query_id"),
                F.col("id_b").alias("neighbor_id"), "cosine",
                F.col("rank").cast("long").alias("rank"))
    )
