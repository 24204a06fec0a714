"""Text-analysis operators for training-data pipelines.

Language ID (stopword-hit heuristic), quality scoring, token statistics
and document fingerprinting — each a shuffle-free JVM projection over
the text column (plus one groupBy for fingerprints). All formulas are
deliberately expressible in plain SQL so every operator carries a
DuckDB oracle (the differential-testing discipline of the reference,
applied to the text layer).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from jaccard_ml_spark.functions import stable_round6
from jaccard_ml_spark.functions.text import shingles_from_tokens, tokens

# tiny pinned stopword lists (public knowledge); deterministic tie-break
# by language code; zero hits → 'und'
STOPWORDS = {
    "de": ["der", "die", "und", "den", "von", "zu", "das", "mit", "ist",
           "nicht"],
    "en": ["the", "and", "of", "to", "in", "is", "you", "that", "it",
           "for"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "es", "se", "no"],
    "fr": ["le", "de", "un", "et", "les", "des", "en", "du", "est",
           "une"],
}


def token_stats(docs: DataFrame, id_col: str = "doc_id",
                text_col: str = "text") -> DataFrame:
    """(doc_id, n_chars, n_tokens, n_distinct_tokens, avg_token_len)."""
    toks = tokens(F.col(text_col))
    return docs.select(
        F.col(id_col),
        F.length(text_col).cast("long").alias("n_chars"),
        F.size(toks).cast("long").alias("n_tokens"),
        F.size(F.array_distinct(toks)).cast("long")
        .alias("n_distinct_tokens"),
        stable_round6(
            F.when(F.size(toks) > 0,
                   F.aggregate(toks, F.lit(0.0),
                               lambda acc, t: acc + F.length(t))
                   / F.size(toks)).otherwise(F.lit(0.0))
        ).alias("avg_token_len"),
        # BPE-ish subword estimate: ceil(len/4) per token — the classic
        # ~4-chars-per-token heuristic, integer-exact in any engine
        F.aggregate(
            toks, F.lit(0).cast("long"),
            lambda acc, t: acc + F.floor((F.length(t) + 3) / 4).cast("long"),
        ).alias("bpe_token_est"),
    )


def quality_score(docs: DataFrame, id_col: str = "doc_id",
                  text_col: str = "text") -> DataFrame:
    """Composite [0,1] quality score.

    0.3·min(n_tokens/100, 1) + 0.3·(distinct/total tokens)
    + 0.4·min(avg_token_len/8, 1) — length, lexical diversity, word
    shape. Degenerate empty docs score 0.
    """
    toks = tokens(F.col(text_col))
    n = F.size(toks)
    distinct_ratio = F.when(
        n > 0, F.size(F.array_distinct(toks)) / n.cast("double")
    ).otherwise(F.lit(0.0))
    avg_len = F.when(
        n > 0,
        F.aggregate(toks, F.lit(0.0), lambda a, t: a + F.length(t)) / n,
    ).otherwise(F.lit(0.0))
    score = (
        0.3 * F.least(n / F.lit(100.0), F.lit(1.0))
        + 0.3 * distinct_ratio
        + 0.4 * F.least(avg_len / F.lit(8.0), F.lit(1.0))
    )
    return docs.select(
        F.col(id_col),
        F.size(toks).cast("long").alias("n_tokens"),
        stable_round6(score).alias("quality"),
    )


def language_id(docs: DataFrame, id_col: str = "doc_id",
                text_col: str = "text") -> DataFrame:
    """Stopword-hit language guess: argmax over per-language distinct-
    token hits, ties → lexicographically first code, no hits → 'und'."""
    toks = F.array_distinct(tokens(F.col(text_col)))
    hit_cols = {
        lang: F.size(F.array_intersect(
            toks, F.array(*[F.lit(w) for w in words]))).cast("long")
        for lang, words in STOPWORDS.items()
    }
    out = docs.select(F.col(id_col), *[
        c.alias(f"hits_{lang}") for lang, c in hit_cols.items()
    ])
    best = F.greatest(*[F.col(f"hits_{lang}") for lang in STOPWORDS])
    guess = F.lit("und")
    # reversed order + when-chains → first lexicographic lang wins ties
    for lang in sorted(STOPWORDS, reverse=True):
        guess = F.when(
            (best > 0) & (F.col(f"hits_{lang}") == best), F.lit(lang)
        ).otherwise(guess)
    return out.withColumn("lang_guess", guess).select(
        id_col, *[f"hits_{lang}" for lang in sorted(STOPWORDS)],
        "lang_guess")


def fingerprint(docs: DataFrame, k_shingle: int = 5, bottom_k: int = 4,
                id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Bottom-k document sketch: the ``bottom_k`` smallest md5 digests of
    the doc's distinct k-shingles, joined with '|'.

    A winnowing-style fingerprint with a SQL-replicable hash (md5 exists
    verbatim in both Spark and DuckDB) — two docs share a fingerprint iff
    their smallest shingle hashes agree, a cheap pre-filter for dedup.
    """
    with_toks = docs.select(F.col(id_col),
                            tokens(F.col(text_col)).alias("_toks"))
    sh = shingles_from_tokens(F.col("_toks"), k_shingle)
    with_sh = with_toks.select(F.col(id_col), sh.alias("_sh"))
    digests = F.array_sort(F.transform(F.col("_sh"), lambda s: F.md5(s)))
    return with_sh.select(
        F.col(id_col),
        F.size("_sh").cast("long").alias("n_shingles"),
        F.array_join(F.slice(digests, 1, bottom_k), "|").alias("fingerprint"),
    )
