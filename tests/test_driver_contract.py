"""Driver-contract conformance: every queries() entry matches its DuckDB
oracle (the same comparison the driver runs at sf0.01), and entry() is a
stable smoke query."""

from __future__ import annotations

import sys

import pytest

sys.path.insert(0, "/root/repo")

SF_DIR = "/root/testdata/sf0.001"


def test_entry_smoke(spark):
    import __spark_entry__ as E

    df = E.entry(spark)
    assert df.count() >= 0
    assert [f.name for f in df.schema.fields] == ["doc_id", "cluster_id"]


def test_queries_have_oracles_or_are_flagged(spark):
    import __spark_entry__ as E

    qs, os_ = E.queries(), E.oracle_sql()
    assert set(os_) <= set(qs)
    # round 5: EVERY query now has a full value oracle — the last two
    # (engine-hash-family MinHash/SimHash internals) are covered by the
    # bit-exact HUGEINT replica of the Arrow kernels (__spark_entry__
    # "engine hash family in SQL" section).
    assert set(qs) == set(os_)


@pytest.mark.slow
def test_all_queries_match_oracles(spark):
    from tests.oracle_harness import run_all

    results = run_all(spark, SF_DIR)
    bad = {k: v for k, v in results.items() if not v["ok"]}
    assert not bad, bad


def test_minhash_band_stats_invariants(spark):
    """Rows-only invariant oracle for the one query whose values are
    not SQL-expressible (engine hash family): every configured band
    must appear exactly once, and each band's bucket sizes must sum to
    the number of documents that produced a signature."""
    import __spark_entry__ as E
    from jaccard_ml_spark.config import DedupConfig

    cfg = DedupConfig()
    rows = E.q_minhash_band_stats(spark, SF_DIR).collect()
    assert [r.band_id for r in rows] == list(range(cfg.bands))
    n_sigs = E._doc_sets(spark, SF_DIR).where(
        "size(items) > 0").count()
    for r in rows:
        assert r.n_rows == n_sigs, (r.band_id, r.n_rows, n_sigs)
        assert 1 <= r.n_buckets <= n_sigs
        assert r.max_bucket >= 1
        assert abs(r.avg_bucket - r.n_rows / r.n_buckets) < 1e-4


def test_cli_defaults_equal_pinned_config():
    """jobs/dedup.py defaults must be sourced from DedupConfig — a
    hard-coded (128, 32) default once reintroduced the measured ~75×
    false-candidate blowup the (96, 16) banding was tuned to kill."""
    import jobs.dedup as J
    from jaccard_ml_spark.config import DEFAULT_CONFIG

    import argparse
    captured = {}
    real_parse = argparse.ArgumentParser.parse_args

    def fake_parse(self, *a, **k):
        ns = real_parse(self, ["--input", "x", "--output", "y"])
        captured.update(vars(ns))
        raise SystemExit(0)  # stop before any Spark work

    argparse.ArgumentParser.parse_args = fake_parse
    try:
        import pytest
        with pytest.raises(SystemExit):
            J.main()
    finally:
        argparse.ArgumentParser.parse_args = real_parse
    assert captured["num_perm"] == DEFAULT_CONFIG.num_perm
    assert captured["bands"] == DEFAULT_CONFIG.bands
    assert captured["k_shingle"] == DEFAULT_CONFIG.k_shingle
    assert captured["threshold"] == DEFAULT_CONFIG.jaccard_threshold
