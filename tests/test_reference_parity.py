"""Reference parity: the hand-computed 10-vertex fixture.

The reference ships hand-calculated AA/RA/PA/Jaccard/CN values for a
10-vertex graph (``/root/reference/example_values/py_calc_values.txt``).
The graph's edge list is the Common-Neighbors section's pair list (its
degrees reproduce every Preferential-Attachment product); the other
sections score the *non-edge* pairs. We feed the adjacency sets through
the generic pairwise set-metrics operator and assert exact agreement —
our analog of the reference's golden-file comparison
(``src/utils.cuh:689-698``) at 1e-6 instead of its 1e-3.
"""

from __future__ import annotations

import math

import pytest

from jaccard_ml_spark.operators.setsim import (
    exact_jaccard_pairs,
    pairwise_metrics,
)

# Edges = the CN-section pairs of py_calc_values.txt:95-118.
EDGES = [
    (0, 1), (0, 9), (0, 2), (0, 8), (0, 4),
    (1, 2), (1, 3), (1, 5),
    (2, 3), (2, 4), (2, 8),
    (3, 4), (3, 5), (3, 7),
    (4, 5), (4, 6),
    (5, 6), (5, 7), (5, 9),
    (6, 7), (6, 8),
    (7, 8), (7, 9),
    (8, 9),
]

# py_calc_values.txt:70-92 (Jaccard) / :1-22 (AA) / :24-46 (RA) / :48-69 (PA)
EXPECTED_JACCARD = {
    (0, 3): 0.42857142857142855, (0, 5): 0.375, (0, 6): 0.2857142857142857,
    (0, 7): 0.25, (1, 4): 0.8, (1, 6): 0.14285714285714285,
    (1, 7): 0.2857142857142857, (1, 8): 0.2857142857142857,
    (1, 9): 0.3333333333333333, (2, 9): 0.2857142857142857, (2, 5): 0.375,
    (2, 6): 0.2857142857142857, (2, 7): 0.25, (3, 8): 0.25,
    (3, 9): 0.2857142857142857, (3, 6): 0.5, (4, 8): 0.42857142857142855,
    (4, 9): 0.2857142857142857, (4, 7): 0.42857142857142855, (5, 8): 0.375,
    (6, 9): 0.6,
}
EXPECTED_AA = {
    (0, 3): 1.9640173895637054, (1, 4): 2.4221154302300825,
    (1, 6): 0.5581106265512472, (6, 9): 1.800780495670471,
    (5, 8): 2.064029975448575,
}
EXPECTED_RA = {
    (0, 3): 0.65, (1, 4): 0.7666666666666667, (1, 6): 0.16666666666666666,
    (6, 9): 0.5666666666666667, (5, 8): 0.7,
}
EXPECTED_PA = {(0, 3): 25, (1, 4): 20, (1, 6): 16, (5, 8): 30, (6, 9): 16}
EXPECTED_CN = {(0, 1): 1, (0, 2): 3, (0, 8): 2, (1, 2): 2, (8, 9): 2}


def adjacency_sets():
    adj: dict[int, set[int]] = {v: set() for v in range(10)}
    for u, v in EDGES:
        adj[u].add(v)
        adj[v].add(u)
    return adj


@pytest.fixture(scope="module")
def metric_rows(spark):
    adj = adjacency_sets()
    df = spark.createDataFrame(
        [(k, sorted(vs)) for k, vs in adj.items()], "id long, items array<long>"
    )
    rows = pairwise_metrics(df).collect()
    return {(r.id_a, r.id_b): r for r in rows}


def test_degrees_match_pref_attachment(metric_rows):
    adj = adjacency_sets()
    for (u, v), pa in EXPECTED_PA.items():
        assert len(adj[u]) * len(adj[v]) == pa


def test_jaccard_parity(metric_rows):
    for pair, expected in EXPECTED_JACCARD.items():
        assert pair in metric_rows, f"missing pair {pair}"
        assert metric_rows[pair].jaccard == pytest.approx(expected, abs=1e-9)


def test_adamic_adar_parity(metric_rows):
    for pair, expected in EXPECTED_AA.items():
        assert metric_rows[pair].adamic_adar == pytest.approx(expected, abs=1e-9)


def test_resource_alloc_parity(metric_rows):
    for pair, expected in EXPECTED_RA.items():
        assert metric_rows[pair].resource_alloc == pytest.approx(
            expected, abs=1e-9)


def test_common_neighbors_parity(metric_rows):
    for pair, expected in EXPECTED_CN.items():
        assert metric_rows[pair].common_neighbors == expected


def test_pref_attachment_and_sorensen_and_salton(metric_rows):
    adj = adjacency_sets()
    for pair in EXPECTED_JACCARD:
        r = metric_rows[pair]
        du, dv = len(adj[pair[0]]), len(adj[pair[1]])
        inter = len(adj[pair[0]] & adj[pair[1]])
        assert r.pref_attachment == du * dv
        assert r.sorensen == pytest.approx(inter / (du + dv), abs=1e-9)
        assert r.salton == pytest.approx(inter / math.sqrt(du * dv), abs=1e-9)


def test_exact_jaccard_pairs_threshold(spark):
    adj = adjacency_sets()
    df = spark.createDataFrame(
        [(k, sorted(vs)) for k, vs in adj.items()], "id long, items array<long>"
    )
    found = {
        (r.id_a, r.id_b): r.jaccard
        for r in exact_jaccard_pairs(df, threshold=0.5).collect()
    }
    expected = {p: j for p, j in EXPECTED_JACCARD.items() if j >= 0.5}
    assert set(found) == set(expected)
    for p, j in expected.items():
        assert found[p] == pytest.approx(j, abs=1e-9)


def test_pairs_are_canonical_and_unique(metric_rows):
    # the compute-once invariant (SURVEY §1.4.2/3): one row per unordered
    # pair, id_a < id_b
    assert all(a < b for a, b in metric_rows)
