"""The verify-join semi-filter must be a pure byte-reduction: only ids
present in some candidate pair can survive the inner join, so
pre-filtering the sets side (broadcast leftsemi on the candidate-id
set) must not change a single output row.

It is OFF by default — a 45M-turn A/B measured it 32% slower in the
LSH pipeline because the uncached candidate subtree evaluates twice
(SCALE_NOTES.md; docstring in operators/verify.py) — but the
semantics are asserted here so the selective-probe regimes that DO
enable it stay correct.

Reference analog: the probe-side compaction before the intersection
kernels (/root/reference/src/edge_metrics.cu probe build) — only
vertices on some edge enter the probe structure.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from jaccard_ml_spark.operators.verify import verify_pairs


@pytest.fixture(scope="module")
def fixture_dfs(spark):
    sets = spark.createDataFrame(
        [(i, sorted({(i * 7 + j) % 40 for j in range(12)}))
         for i in range(50)],
        "id long, items array<long>")
    # candidates touch only 8 of the 50 ids
    cands = spark.createDataFrame(
        [(1, 2), (3, 4), (5, 6), (7, 8), (1, 8)],
        "id_a long, id_b long")
    return sets, cands


def test_semi_filter_identical_rows(fixture_dfs):
    sets, cands = fixture_dfs
    on = verify_pairs(cands, sets, 0.0, semi_filter=True,
                      keep_below_threshold=True).collect()
    off = verify_pairs(cands, sets, 0.0, semi_filter=False,
                       keep_below_threshold=True).collect()
    key = lambda r: (r.id_a, r.id_b)
    assert sorted(on, key=key) == sorted(off, key=key)
    assert len(on) == 5


def test_semi_filter_plan_broadcasts_candidate_ids(fixture_dfs):
    sets, cands = fixture_dfs
    plan = (verify_pairs(cands, sets, 0.5, semi_filter=True)
            ._jdf.queryExecution().executedPlan().toString())
    assert "LeftSemi" in plan, plan
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan, plan


def test_semi_filter_off_has_no_semi_join(fixture_dfs):
    sets, cands = fixture_dfs
    plan = (verify_pairs(cands, sets, 0.5, semi_filter=False)
            ._jdf.queryExecution().executedPlan().toString())
    assert "LeftSemi" not in plan


def test_semi_filter_persist_registers_for_release(fixture_dfs):
    """The candidate persist is reachable through the module registry —
    without it, a diagnostic loop leaked one cached candidate table per
    verify_pairs call (r4 ADVICE pattern)."""
    from jaccard_ml_spark.operators import verify as V

    sets, cands = fixture_dfs
    V.release_persisted()            # clean slate
    V.verify_pairs(cands, sets, 0.0, semi_filter=True,
                   keep_below_threshold=True).count()
    assert V.release_persisted() == 1
    assert V.release_persisted() == 0
    # an already-persisted candidate table is NOT re-persisted
    pc = cands.persist()
    try:
        V.verify_pairs(pc, sets, 0.0, semi_filter=True,
                       keep_below_threshold=True).count()
        assert V.release_persisted() == 0
    finally:
        pc.unpersist()


def test_semi_filter_persist_level_pins_tier(fixture_dfs):
    """A harness comparing cluster sizes pins EVERY cache to one tier;
    verify's candidate persist must honor the caller's level (Spark's
    MEMORY_AND_DISK default is memory-resident at one level and
    spilled at the other — storage asymmetry, not compute scaling)."""
    from pyspark import StorageLevel

    from jaccard_ml_spark.operators import verify as V

    sets, cands = fixture_dfs
    V.release_persisted()
    out = V.verify_pairs(cands, sets, 0.0, semi_filter=True,
                         keep_below_threshold=True,
                         persist_level=StorageLevel.DISK_ONLY)
    out.count()
    assert len(V._PERSISTED) == 1
    lvl = V._PERSISTED[0].storageLevel
    assert lvl.useDisk and not lvl.useMemory
    assert V.release_persisted() == 1
