"""Multimodal columns: opaque binary payloads + typed metadata.

Images/audio/video ride through the pipeline as ``binary`` columns with
a metadata struct; decode / feature-extraction / resize / frame-sample
run as Arrow-batched ``mapInPandas`` stages. The actual codec calls are
STUBBED in this container (no image/audio libraries) behind
``decode_stub`` — a deterministic fake that derives pseudo-features
from the payload bytes — so the Spark-side plumbing (schema,
partitioning, UDF signature, batch shape) is real and tested while the
codec is swappable.

At 100 TB the binary column dominates I/O: keep payloads in their own
parquet column chunk (they are, by columnar construction), filter and
project on metadata FIRST so payload bytes are never read for pruned
rows (Spark's parquet reader skips unselected columns), and size
``maxPartitionBytes`` so one task holds a bounded number of payloads.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("kind", T.StringType(), False),      # image|audio|video
    T.StructField("mime", T.StringType(), True),
    T.StructField("payload", T.BinaryType(), True),
    T.StructField("width", T.IntegerType(), True),
    T.StructField("height", T.IntegerType(), True),
    T.StructField("duration_ms", T.LongType(), True),
])

FEATURE_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("kind", T.StringType(), False),
    T.StructField("byte_len", T.LongType(), False),
    T.StructField("content_hash", T.StringType(), False),
    T.StructField("feature", T.ArrayType(T.FloatType()), True),
])


def decode_stub(payload: bytes, dim: int = 16) -> np.ndarray:
    """Deterministic fake 'decoder': sha256-seeded pseudo-feature.

    Swap for a real codec (PIL/torchaudio/ffmpeg) in production:
    the function contract — bytes in, fixed-dim float32 out — is the
    whole integration surface.
    """
    if payload is None:
        raise NotImplementedError(
            "real media decode not available in this environment")
    digest = hashlib.sha256(payload).digest()
    raw = np.frombuffer((digest * ((dim * 4) // len(digest) + 1))[: dim * 4],
                        dtype=np.uint32)
    return (raw.astype(np.float64) / np.float64(2**32)).astype(np.float32)


def extract_features(media: DataFrame, dim: int = 16) -> DataFrame:
    """mapInPandas feature extraction: one Arrow batch per task chunk.

    Never collects payloads to the driver; each executor decodes its
    partition's batches and emits fixed-width features.
    """

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats, hashes, lens = [], [], []
            for payload in pdf["payload"]:
                b = bytes(payload) if payload is not None else b""
                lens.append(len(b))
                hashes.append(hashlib.sha256(b).hexdigest()[:16])
                feats.append(decode_stub(b, dim).tolist())
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "kind": pdf["kind"],
                "byte_len": pd.Series(lens, dtype="int64"),
                "content_hash": hashes,
                "feature": feats,
            })

    return media.select("media_id", "kind", "payload").mapInPandas(
        _extract, FEATURE_SCHEMA)


def synthesize_media(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic fake media table for tests (payload = seeded bytes)."""
    rng = np.random.default_rng(seed)
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        kind = kinds[i % 3]
        payload = rng.integers(0, 256, size=int(rng.integers(64, 2048)),
                               dtype=np.uint8).tobytes()
        rows.append((
            i, kind, f"application/x-fake-{kind}", bytearray(payload),
            32 * (i % 4 + 1) if kind == "image" else None,
            32 * (i % 3 + 1) if kind == "image" else None,
            int(rng.integers(1000, 60000)) if kind != "image" else None,
        ))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
