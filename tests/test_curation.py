"""Curation operators: representative selection + decontamination.

Semantics on planted inputs, plus plan-shape assertions (the eval side
of decontaminate must enter as a broadcast, never a shuffle of the
training side).
"""

from __future__ import annotations

import sys

from pyspark.sql import functions as F

sys.path.insert(0, "/root/repo")

from jaccard_ml_spark.operators.curation import (  # noqa: E402
    cluster_representatives,
    decontaminate,
)

SF_DIR = "/root/testdata/sf0.001"


def _sets(spark, rows):
    return spark.createDataFrame(rows, "id long, items array<long>")


def test_representatives_planted(spark):
    clusters = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1), (7, 7), (9, 9), (10, 9)],
        "id long, cluster_id long")
    quality = spark.createDataFrame(
        # cluster 1: 2 wins on quality; cluster 9: tie -> lowest id (9)
        [(1, 0.5), (2, 0.9), (3, 0.7), (7, 0.1), (9, 0.4), (10, 0.4)],
        "doc_id long, quality double")
    out = {r.doc_id: r for r in
           cluster_representatives(clusters, quality).collect()}
    assert len(out) == 6
    assert [out[i].rep_id for i in (1, 2, 3)] == [2, 2, 2]
    assert out[7].rep_id == 7 and out[7].keep == 1
    assert out[9].rep_id == 9 and out[10].rep_id == 9
    assert out[9].keep == 1 and out[10].keep == 0
    for r in out.values():
        assert r.keep == (1 if r.doc_id == r.rep_id else 0)


def test_representatives_member_without_quality_row(spark):
    """ADVICE r3 (low): a member missing its quality row must still
    appear in the output (on the drop list unless it is the only
    member) — the old inner join silently retained it downstream —
    and an unscored member never wins the argmax from a scored one."""
    clusters = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1), (5, 5), (6, 5)],
        "id long, cluster_id long")
    quality = spark.createDataFrame(
        # doc 3 has NO quality row; cluster 5 has NO scored member
        [(1, 0.5), (2, 0.9)],
        "doc_id long, quality double")
    out = {r.doc_id: r for r in
           cluster_representatives(clusters, quality).collect()}
    assert set(out) == {1, 2, 3, 5, 6}          # nothing vanishes
    assert out[3].rep_id == 2 and out[3].keep == 0   # unscored loses
    # all-unscored cluster: deterministic lowest-id representative
    assert out[5].rep_id == 5 and out[5].keep == 1
    assert out[6].rep_id == 5 and out[6].keep == 0


def test_representatives_exactly_one_keep_per_cluster(spark):
    """End-to-end on real sf0.001 docs: keep-count per cluster is 1 and
    the kept member maximises (quality, -doc_id) within its cluster."""
    import __spark_entry__ as E

    rows = E.q_cluster_representatives(spark, SF_DIR).collect()
    by_cluster: dict[int, list] = {}
    for r in rows:
        by_cluster.setdefault(r.cluster_id, []).append(r)
    assert sum(len(v) for v in by_cluster.values()) == len(rows)
    qual = {r.doc_id: r.quality
            for r in E.q_quality_score(spark, SF_DIR).collect()}
    for cid, members in by_cluster.items():
        keeps = [m for m in members if m.keep == 1]
        assert len(keeps) == 1, (cid, members)
        best = max(members, key=lambda m: (qual[m.doc_id], -m.doc_id))
        assert keeps[0].doc_id == best.doc_id
        assert all(m.rep_id == best.doc_id for m in members)


def test_decontaminate_planted_leak(spark):
    ev = _sets(spark, [(100, [1, 2, 3, 4]), (200, [50, 51])])
    tr = _sets(spark, [
        (1, [1, 2, 3, 4, 99, 98]),   # full containment of eval 100
        (2, [1, 2, 7, 8]),           # 2/4 = 0.5 of eval 100
        (3, [60, 61, 62]),           # disjoint
    ])
    out = {(r.train_id, r.eval_id): r
           for r in decontaminate(tr, ev, threshold=0.5).collect()}
    assert set(out) == {(1, 100), (2, 100)}
    assert out[(1, 100)].containment == 1.0
    assert out[(1, 100)].size_eval == 4
    assert out[(2, 100)].containment == 0.5


def test_decontaminate_eval_side_is_broadcast(spark):
    """The posting join must be a broadcast hash join (eval side ships
    to executors; the 100-TB training side never shuffles for it)."""
    ev = _sets(spark, [(100, [1, 2, 3])])
    tr = _sets(spark, [(1, [1, 2, 3]), (2, [4, 5])])
    plan = decontaminate(tr, ev)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    # no sort-merge join anywhere: both the posting join and the
    # eval-size join are broadcasts
    assert "SortMergeJoin" not in plan
