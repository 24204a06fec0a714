"""MinHash signatures and SimHash fingerprints — vectorized Arrow UDFs.

MinHash (Broder '97): signature[j] = min over set elements x of
h_j(x), with h_j a seeded multiply-add universal hash mod 2^64
(uint64 wraparound is the modulus — free and deterministic in numpy).
The permutation count comes from DedupConfig (default num_perm=96 =
16 bands × 6 rows — see config.py for the recall math); the j-th row
of two signatures collides with probability equal to the true Jaccard
similarity.

The computation crosses the JVM boundary once per Arrow batch (the
``input_hint`` mandate: no per-row Python); inside the batch it is one
flat numpy kernel over the concatenated element arrays using
``np.minimum.reduceat`` — the moral equivalent of the reference's
warp-level partial/final reduction (``/root/reference/src/gpu_utils.cu:59-65``),
with Arrow batches standing in for warps.

SimHash (Charikar '02): w-bit fingerprint; bit b = sign of the sum over
elements of (+1 if bit b of h(x) else -1). Near-textual duplicates land
within a small Hamming distance.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

_MULT = np.uint64(0x9E3779B97F4A7C15)  # golden-ratio odd constant


def _perm_params(num_perm: int, seed: int) -> tuple[np.ndarray, np.ndarray]:
    """Deterministic (a, b) multiply-add parameters; a forced odd."""
    rng = np.random.default_rng(seed)
    a = rng.integers(1, 2**63, size=num_perm, dtype=np.uint64) * 2 + 1
    b = rng.integers(0, 2**63, size=num_perm, dtype=np.uint64)
    return a, b


def minhash_core(hashes: pd.Series, a: np.ndarray, b: np.ndarray,
                 num_perm: int) -> pd.Series:
    """Batch kernel: Series of int64 element arrays → Series of
    num_perm-long int64 signature arrays (None for empty/null sets).

    Shared by the standalone ``minhash_udf`` and the fused
    shingle+minhash pass (functions/shingle_arrow.py) so both produce
    bit-identical signatures — the fused path exists to skip one full
    Arrow round trip of the element arrays, the largest column in the
    pipeline.
    """
    n_rows = len(hashes)
    out: list = [None] * n_rows
    # flatten the batch, then one fused 1-D pass PER PERMUTATION:
    # h = a_j * values + b_j (wrapping uint64) followed by a 1-D
    # minimum.reduceat at row offsets. The 1-D contiguous layout is
    # ~77x faster than the (values × num_perm) 2-D axis-0 reduceat
    # (measured) and its temporaries are O(N), not O(N · num_perm).
    arrays, idx, lens = [], [], []
    for i in range(n_rows):
        arr = hashes.iloc[i]
        if arr is not None and len(arr) > 0:
            arrays.append(np.asarray(arr, dtype=np.int64))
            idx.append(i)
            lens.append(len(arr))
    if not arrays:
        return pd.Series(out)
    values = np.concatenate(arrays).view(np.uint64)
    offsets = np.zeros(len(arrays), dtype=np.intp)
    np.cumsum(lens[:-1], out=offsets[1:])
    mins = np.empty((len(arrays), num_perm), dtype=np.uint64)
    # reuse one scratch buffer across permutations: fresh 8·N-byte
    # temporaries per perm are mmap-churn under concurrent workers
    hj = np.empty_like(values)
    for j in range(num_perm):
        np.multiply(values, a[j], out=hj)
        np.add(hj, b[j], out=hj)
        np.minimum.reduceat(hj, offsets, out=mins[:, j])
    mins = mins.view(np.int64)
    for j, i in enumerate(idx):
        out[i] = mins[j]
    return pd.Series(out)


def minhash_udf(num_perm: int, seed: int):
    """pandas UDF: array<long> shingle hashes → array<long> signature.

    Empty/null sets → null signature (the document simply never enters
    any LSH bucket — matching the reference's dropped self-loop edges,
    src/utils.cuh:170).
    """
    a, b = _perm_params(num_perm, seed)

    def _minhash_kernel(hashes: pd.Series) -> pd.Series:
        return minhash_core(hashes, a, b, num_perm)

    from jaccard_ml_spark.functions._trace import traced
    return pandas_udf(T.ArrayType(T.LongType()))(
        traced("minhash", _minhash_kernel))


def simhash_udf(bits: int = 64, seed: int = 42):
    """pandas UDF: array<long> element hashes → long SimHash fingerprint.

    Elements are remixed with a seeded multiplier so the fingerprint is
    independent of the MinHash family. Unweighted (sets, not bags) —
    matching the engine's set semantics (SURVEY §1.4.1).
    """
    if bits > 64:
        raise ValueError("simhash supports up to 64 bits")
    rng = np.random.default_rng(seed + 1)
    mix = np.uint64(rng.integers(1, 2**63, dtype=np.uint64) * 2 + 1)
    add = np.uint64(rng.integers(0, 2**63, dtype=np.uint64))

    @pandas_udf(T.LongType())
    def _simhash(hashes: pd.Series) -> pd.Series:
        # same flatten + reduceat scheme as the MinHash kernel: one
        # fused 1-D pass per BIT over the concatenated batch (bounded
        # 64 iterations), instead of a fresh (len × bits) bit matrix
        # per row — the per-row numpy dispatch overhead of the old loop
        # dominated at scale (the only kernel left unflattened in r2).
        n_rows = len(hashes)
        arrays, idx, lens = [], [], []
        for i in range(n_rows):
            arr = hashes.iloc[i]
            if arr is not None and len(arr) > 0:
                arrays.append(np.asarray(arr, dtype=np.int64))
                idx.append(i)
                lens.append(len(arr))
        out = np.zeros(n_rows, dtype=np.int64)
        if not arrays:
            return pd.Series(out)
        x = np.concatenate(arrays).view(np.uint64) * mix + add
        offsets = np.zeros(len(arrays), dtype=np.intp)
        np.cumsum(lens[:-1], out=offsets[1:])
        half = np.asarray(lens, dtype=np.int64)  # ones > len/2 ⟺ votes>0
        fp = np.zeros(len(arrays), dtype=np.uint64)
        bit = np.empty_like(x)
        ones = np.empty(len(arrays), dtype=np.uint64)
        for b in range(bits):
            np.right_shift(x, np.uint64(b), out=bit)
            np.bitwise_and(bit, np.uint64(1), out=bit)
            np.add.reduceat(bit, offsets, out=ones)
            fp |= ((2 * ones.astype(np.int64) - half) > 0).astype(
                np.uint64) << np.uint64(b)
        out[idx] = fp.view(np.int64)
        return pd.Series(out)

    return _simhash


def band_hash_cols(sig: Column, bands: int, rows_per_band: int) -> Column:
    """array of per-band 64-bit hashes — pure JVM expressions.

    Band j hashes signature rows [j*r, (j+1)*r) together with the band
    index, so identical row values in different bands never collide.
    """
    return F.array(*[
        F.xxhash64(F.slice(sig, j * rows_per_band + 1, rows_per_band),
                   F.lit(j))
        for j in range(bands)
    ])


def hamming_distance64(a: Column, b: Column) -> Column:
    """Hamming distance between two 64-bit fingerprints (JVM bit_count)."""
    return F.bit_count(a.bitwiseXOR(b))
