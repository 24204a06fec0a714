"""Stats→config rules: derive skew-handling parameters from observed
bucket statistics — the reference's ML work-distribution model reborn.

The reference trains a RandomForest on cheap graph stats to pick the
kernel/launch configuration per degree bin
(``/root/reference/ml_model.py:99-116``; the hand-written strategy
rules it replaces live in
``/root/reference/src/edge_metrics_binning.cu:2572-2821``). Our analog
derives the three skew knobs of ``candidate_pairs`` — the salt
threshold c0, the salt factor S, and the band-split threshold c1 —
from the observed LSH bucket-size distribution instead of static
defaults, so a corpus whose skew does not match the defaults (the
highest-frequency real-user failure) still gets bounded task sizes.

Deterministic by construction: the input is the exact bucket-size
HISTOGRAM (size → count, a few hundred rows at any corpus scale — the
degree histogram of /root/reference/src/utils.cuh:326-367), collected
and reduced on the driver with integer arithmetic only. No sampling,
no approximate quantiles (percentile_approx's summary merge is
partition-order-sensitive), so the derived config — and therefore the
candidate set — is identical at any parallelism level.

Sizing model (all integer, documented so it can be audited):

* A NORMAL bucket of size s pairs in one task: cost s·(s-1)/2. Bound
  that by ``max_pairs_per_task`` → c0 ≤ sqrt(2·budget). Within the
  bound, prefer the observed p99.9 of bucket sizes so ≥99.9% of
  buckets take the zero-extra-shuffle path.
* A HOT bucket is salted into S·(S+1)/2 blocks of ~(s/S)² pairs each;
  the largest observed non-mega bucket must fit the budget →
  S = ceil(s_hot_max / sqrt(budget)).
* MEGA buckets (> c1) are re-hashed with longer bands. c1 is where
  salting at S stops bounding block size: c1 = S·sqrt(budget).
* extra_rows: each extra signature row multiplies the non-duplicate
  collision probability by ~t^1 (t = Jaccard at threshold); halving a
  mega bucket of size m down to ≤ c0 needs ~log(m/c0) rows — clamped
  to the rows available.
"""

from __future__ import annotations

import math
from dataclasses import asdict, dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from jaccard_ml_spark.config import DedupConfig


@dataclass(frozen=True)
class SkewParams:
    """Derived work-distribution parameters + the stats that chose them
    (written to the run's metrics table for lineage — the analog of
    the reference's per-run parameters/experiment.json record)."""

    salt_threshold_c0: int
    salt_factor: int
    band_split_c1: int
    band_split_extra_rows: int
    n_buckets: int
    max_bucket: int
    p999_bucket: int
    p50_bucket: int

    def to_dict(self) -> dict:
        return asdict(self)

    def apply(self, cfg: DedupConfig) -> DedupConfig:
        """A new frozen config with the derived knobs swapped in."""
        d = cfg.to_dict()
        d.update(
            salt_threshold_c0=self.salt_threshold_c0,
            salt_factor=self.salt_factor,
            band_split_c1=self.band_split_c1,
            band_split_extra_rows=self.band_split_extra_rows,
        )
        return DedupConfig(**d)


def bucket_size_histogram(grouped: DataFrame) -> list[tuple[int, int]]:
    """(bucket_size → n_buckets), ascending — exact and tiny.

    ``grouped`` is any DataFrame with a ``bucket_size`` column (the
    persisted strategy-fan-out table of candidate_pairs, so this costs
    one scan of an in-memory table, no extra UDF runs).
    """
    rows = (grouped.groupBy("bucket_size")
            .agg(F.count("*").alias("n"))
            .collect())
    return sorted((int(r.bucket_size), int(r.n)) for r in rows)


def derive_skew_params(
    hist: list[tuple[int, int]],
    cfg: DedupConfig,
    max_pairs_per_task: int = 2_000_000,
) -> SkewParams:
    """Integer-deterministic rules mapping the size histogram to the
    three skew knobs (docstring of the module for the model)."""
    if not hist:
        return SkewParams(cfg.salt_threshold_c0, cfg.salt_factor,
                          cfg.band_split_c1, cfg.band_split_extra_rows,
                          0, 0, 0, 0)
    total = sum(n for _, n in hist)
    max_bucket = hist[-1][0]

    def percentile(p: float) -> int:
        target = math.ceil(total * p)
        acc = 0
        for size, n in hist:
            acc += n
            if acc >= target:
                return size
        return max_bucket

    p50 = percentile(0.50)
    p999 = percentile(0.999)

    budget_side = int(math.sqrt(2.0 * max_pairs_per_task))   # ~2000
    c0 = max(16, min(p999, budget_side))

    hot_max = min(max_bucket, cfg.band_split_c1)
    salt = max(2, math.ceil(hot_max / math.sqrt(max_pairs_per_task)))
    salt = min(salt, 64)

    c1 = min(65536, max(4 * c0, int(salt * math.sqrt(max_pairs_per_task))))

    if max_bucket > c1:
        extra = math.ceil(math.log2(max_bucket / max(c0, 1)) / 2.0)
    else:
        extra = cfg.band_split_extra_rows
    extra = max(2, min(extra, cfg.num_perm - cfg.rows_per_band))

    return SkewParams(
        salt_threshold_c0=c0,
        salt_factor=salt,
        band_split_c1=c1,
        band_split_extra_rows=extra,
        n_buckets=total,
        max_bucket=max_bucket,
        p999_bucket=p999,
        p50_bucket=p50,
    )
