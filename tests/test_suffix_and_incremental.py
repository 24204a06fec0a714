"""Substring/containment path and incremental (delta-batch) dedup."""

from __future__ import annotations

from pyspark.sql import functions as F

from jaccard_ml_spark.config import DedupConfig
from jaccard_ml_spark.operators.suffix import substring_pairs
from jaccard_ml_spark.sources.generator import generate_transcripts
from jaccard_ml_spark.sources.tables import read_transcripts
from jaccard_ml_spark.streaming.incremental import incremental_dedup

CFG = DedupConfig()


def test_substring_pairs_finds_planted_prefix(spark, tmp_path):
    meta = generate_transcripts(str(tmp_path / "tx"), n_convs=200, seed=5)
    tx = read_transcripts(spark, meta["transcripts"])
    from jaccard_ml_spark.operators.assemble import assemble_conversations

    conv = assemble_conversations(tx).select(
        F.col("conv_id").alias("doc_id"), "text")
    found = substring_pairs(conv).where(F.col("is_substring") == 1)
    got = {(r.id_small, r.id_big) for r in found.collect()}

    import pandas as pd
    truth = pd.read_parquet(meta["truth_groups"])
    planted = {
        tuple([row.conv_id, row.group_id])
        for _, row in truth[truth.kind == "containment"].iterrows()
    }
    missing = {p for p in planted if p not in got}
    # full recall on planted prefix-duplicates
    assert not missing, f"missed containment plants: {sorted(missing)[:5]}"
    # and every reported substring really is one
    texts = {r.doc_id: r.text for r in conv.collect()}
    for a, b in got:
        import re
        na = re.sub(r"[^a-z0-9]+", " ", texts[a].lower()).strip()
        nb = re.sub(r"[^a-z0-9]+", " ", texts[b].lower()).strip()
        assert na in nb


def test_incremental_equals_batch(spark, tmp_path):
    """Splitting the corpus into two delta batches must give the same
    pairs and clusters as one batch run."""
    meta = generate_transcripts(str(tmp_path / "tx"), n_convs=240, seed=13)
    tx = read_transcripts(spark, meta["transcripts"])

    batch = incremental_dedup(tx, None, None, CFG)
    batch_pairs = {(r.id_a, r.id_b)
                   for r in batch["pairs"].select("id_a", "id_b").collect()}
    batch_clusters = sorted(
        (r.id, r.cluster_id) for r in batch["clusters"].collect())

    ids = sorted(r.conv_id for r in tx.select("conv_id").distinct().collect())
    half = set(ids[: len(ids) // 2])
    tx1 = tx.where(F.col("conv_id").isin(half))
    tx2 = tx.where(~F.col("conv_id").isin(half))

    step1 = incremental_dedup(tx1, None, None, CFG)
    step2 = incremental_dedup(tx2, step1["sets"], step1["pairs"], CFG)
    inc_pairs = {(r.id_a, r.id_b)
                 for r in step2["pairs"].select("id_a", "id_b").collect()}
    inc_clusters = sorted(
        (r.id, r.cluster_id) for r in step2["clusters"].collect())

    assert inc_pairs == batch_pairs
    assert inc_clusters == batch_clusters
