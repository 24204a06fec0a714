"""Arrow-vectorized shingling: text → sorted distinct k-gram hash sets.

The JVM expression path (functions/text.py) allocates ~10-15 KB of
short-lived objects per conversation (normalized string, ~400-900 token
UTF8Strings, slices) — measured as the pipeline's scaling limiter: the
assembly+shingle stage saturates the single-JVM allocator/GC long
before it saturates cores (core-seconds inflate ~3× from 4→16 task
threads while par stays ≈ n_cores).

This path does the same computation per Arrow batch in C-vectorized
steps instead:

  tokenize      python re.split per row (cheap relative to hashing)
  token hash    pd.util.hash_array over one flat object array —
                vectorized siphash, deterministic fixed key
  k-gram hash   rolling polynomial over the flat uint64 token-hash
                array with per-row boundary masking — pure numpy
  distinct+sort np.unique per row slice

Hash family differs from the JVM path (siphash+polynomial vs
xxhash64-of-slices); set cardinalities, equality relations, and
therefore Jaccard values are identical w.h.p. — both are content-keyed
64-bit families. Tokenization is byte-identical to the JVM/DuckDB
definition: lower → collapse [^a-z0-9]+ → trim → split → drop empties.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

_NONALNUM = re.compile(r"[^a-z0-9]+")
_MULT = np.uint64(0x9E3779B97F4A7C15)  # odd polynomial base


def _shingle_batch(texts: pd.Series, k: int) -> pd.Series:
    tok_lists = []
    lens = np.empty(len(texts), dtype=np.int64)
    for i, t in enumerate(texts):
        if t is None:
            tok_lists.append([])
            lens[i] = 0
            continue
        toks = _NONALNUM.sub(" ", t.lower()).split()
        tok_lists.append(toks)
        lens[i] = len(toks)

    empty = np.empty(0, dtype=np.int64)
    total = int(lens.sum())
    out: list = [empty] * len(texts)
    if total == 0:
        return pd.Series(out)

    flat = np.empty(total, dtype=object)
    pos = 0
    for toks in tok_lists:
        n = len(toks)
        if n:
            flat[pos:pos + n] = toks
            pos += n
    th = pd.util.hash_array(flat)  # uint64, vectorized siphash

    # rolling polynomial k-gram hash over the flat array; grams that
    # would cross a row boundary are masked out afterwards
    n_grams = total - k + 1
    starts = np.zeros(len(texts), dtype=np.int64)
    np.cumsum(lens[:-1], out=starts[1:])
    if n_grams > 0:
        acc = th[:n_grams].copy()
        for j in range(1, k):
            acc *= _MULT
            acc += th[j:j + n_grams]
    else:
        acc = np.empty(0, dtype=np.uint64)
    acc_i64 = acc.view(np.int64) if len(acc) else acc

    for i in range(len(texts)):
        n = int(lens[i])
        if n == 0:
            continue
        s = int(starts[i])
        if n >= k:
            grams = acc_i64[s:s + n - k + 1]
        else:
            # short doc: one shingle = polynomial over all its tokens
            h = th[s]
            for j in range(1, n):
                h = h * _MULT + th[s + j]
            grams = np.array([h], dtype=np.uint64).view(np.int64)
        out[i] = np.unique(grams)
    return pd.Series(out)


def shingle_sets_udf(k: int):
    @pandas_udf(T.ArrayType(T.LongType()))
    def _shingles(texts: pd.Series) -> pd.Series:
        return _shingle_batch(texts, k)

    return _shingles


def add_shingle_hash_sets_arrow(df, text_col: str, k: int,
                                out_col: str = "items"):
    """DataFrame helper: the Arrow-vectorized twin of
    functions.text.add_shingle_hash_sets (the production hot path)."""
    udf = shingle_sets_udf(k)
    return df.withColumn(out_col, udf(F.col(text_col)))
