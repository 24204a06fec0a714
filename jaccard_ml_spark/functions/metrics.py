"""The seven pairwise set-similarity metrics of the reference.

Formulas from ``/root/reference/src/metric_formulas.h:4-58`` (computed for
all 7 in ``edge_based_on_device``, ``src/edge_metrics.cu:994-1000``):

    JAC  |∩| / (|A| + |B| − |∩|)
    AA   Σ_{w∈∩} 1/ln(deg(w))          (deg = document frequency here)
    RA   Σ_{w∈∩} 1/deg(w)
    SI   |∩| / (|A| + |B|)             (Sørensen)
    CN   |∩|
    SL   |∩| / sqrt(|A|·|B|)           (Salton — textbook form; the
         reference divides by rsqrtf, i.e. *multiplies* by sqrt —
         a latent quirk at src/metric_formulas.h:44-50 we do NOT copy)
    PA   |A| · |B|

All are plain column arithmetic over (intersection, size_a, size_b) —
whole-stage-codegen friendly. AA/RA additionally need per-element document
frequency, which the set-similarity operator supplies as weighted partial
sums (see operators/setsim.py). fp64 throughout; the reference is fp32
with a 0.001 comparison tolerance (src/utils.cuh:655), so fp64 is strictly
more exact.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

METRIC_NAMES = ("jaccard", "adamic_adar", "resource_alloc", "sorensen",
                "common_neighbors", "salton", "pref_attachment")


def jaccard(inter: Column, size_a: Column, size_b: Column) -> Column:
    return inter / (size_a + size_b - inter)


def sorensen(inter: Column, size_a: Column, size_b: Column) -> Column:
    return inter / (size_a + size_b)


def common_neighbors(inter: Column, size_a: Column, size_b: Column) -> Column:
    return inter.cast("double")


def salton(inter: Column, size_a: Column, size_b: Column) -> Column:
    return inter / F.sqrt(size_a.cast("double") * size_b)


def pref_attachment(inter: Column, size_a: Column, size_b: Column) -> Column:
    return size_a.cast("double") * size_b


SIZE_ONLY_METRICS = {
    "jaccard": jaccard,
    "sorensen": sorensen,
    "common_neighbors": common_neighbors,
    "salton": salton,
    "pref_attachment": pref_attachment,
}

# AA / RA are per-common-element weighted sums; the operator aggregates
# sum(1/ln(df)) and sum(1/df) during the posting-list join instead of a
# post-hoc formula (mirrors the merge-time accumulation at
# /root/reference/src/edge_metrics.cu:926-929).
WEIGHTED_METRICS = ("adamic_adar", "resource_alloc")
