"""Substring / containment dedup — the suffix-path (FIXTURES.md plants
turn-prefix duplicates whose plain Jaccard is low).

Scale design (no quadratic substring scan):

1. **Anchor sampling**: every char-k-gram of a document is hashed; a
   deterministic content-keyed sample (hash % mod == 0) is kept — a
   winnowing-style sketch. If A is a contiguous substring of B, every
   interior k-gram of A also occurs in B, so A's sampled anchor set is
   a SUBSET of B's: anchor-containment of true substrings is exactly
   1.0 → sampling loses no recall, only shrinks posting lists by ~mod×.
2. **Candidate generation**: posting-list containment join on anchors
   (operators/dedup.containment_pairs machinery).
3. **Exact verification**: candidates join back to the two texts;
   a JVM ``instr`` check confirms real substring containment (boundary
   k-grams make anchor-containment slightly optimistic, never
   pessimistic for |A| ≥ k).

Documents shorter than k chars have no k-grams — they fall to the
exact-dedup/md5 path, which catches tiny exact copies anyway.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from jaccard_ml_spark.functions.text import normalize_text
from jaccard_ml_spark.operators.dedup import containment_pairs


def anchor_sets(docs: DataFrame, k_char: int = 24, mod: int = 8,
                id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(id, items): content-keyed sampled char-k-gram hashes.

    The normalized text is materialized as a column attribute before the
    gram loop (HOF-lambda re-evaluation hazard — functions/text.py).
    """
    with_norm = docs.select(
        F.col(id_col).alias("id"),
        normalize_text(F.col(text_col)).alias("_norm"))
    norm = F.col("_norm")
    n = F.greatest(F.length(norm) - F.lit(k_char - 1), F.lit(0))
    grams = F.transform(
        F.sequence(F.lit(1), n),
        lambda i: F.xxhash64(F.substring(norm, i, k_char)),
    )
    sampled = F.filter(grams, lambda h: F.pmod(h, F.lit(mod)) == 0)
    return with_norm.select(
        "id",
        F.array_sort(F.array_distinct(sampled)).alias("items"),
    ).where(F.size("items") > 0)


def substring_pairs(
    docs: DataFrame,
    k_char: int = 24,
    mod: int = 8,
    anchor_threshold: float = 1.0,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Exact substring-containment pairs.

    Returns (id_small, id_big, containment, is_substring) where
    is_substring=1 means normalized text of id_small occurs verbatim
    inside id_big's. Candidates from anchor containment ≥ threshold
    (1.0 keeps full recall for |A| ≥ k_char); verification is exact.
    """
    anchors = anchor_sets(docs, k_char, mod, id_col, text_col)
    cands = containment_pairs(anchors, threshold=anchor_threshold)

    texts = docs.select(F.col(id_col).alias("_tid"),
                        normalize_text(F.col(text_col)).alias("_norm"))
    verified = (
        cands.select("id_small", "id_big", "containment")
        .join(texts.withColumnsRenamed(
            {"_tid": "id_small", "_norm": "_text_small"}), "id_small")
        .join(texts.withColumnsRenamed(
            {"_tid": "id_big", "_norm": "_text_big"}), "id_big")
        .select(
            "id_small", "id_big", "containment",
            (F.instr(F.col("_text_big"), F.col("_text_small")) > 0)
            .cast("long").alias("is_substring"),
        )
    )
    return verified
