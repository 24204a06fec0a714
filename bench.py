"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS]; prints ONE JSON line.

Also runs the full transcripts dedup pipeline on a deterministic
synthetic transcripts table sized to the scale factor and reports its
turns/sec (the BASELINE.json throughput metric). Scaling-efficiency
evidence (local[8] vs local[32]) lives in BENCH/scaling.py.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

# headline queries from the driver contract (scale-relevant subset)
HEADLINE = [
    "exact_dedup",
    "token_stats",
    "quality_score",
    "fingerprint",
    "ngram_jaccard_pairs",
    "lsh_near_dup_pairs",
    "dedup_clusters",
    "containment_pairs",
    "cosine_topk",
    "ann_topk",
    "ivf_topk",
    "embedding_near_dup",
    "assemble_convs",
    "decontaminate",
]


def _sf_from_dir(d: str) -> float:
    base = os.path.basename(d.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return -1.0


def _bench_transcripts(spark, sf: float) -> tuple[float, int]:
    """Full pipeline wall time on a synthetic transcripts table."""
    from jaccard_ml_spark.config import DedupConfig
    from jaccard_ml_spark.plans.pipeline import dedup_pipeline
    from jaccard_ml_spark.sources.generator import generate_transcripts
    from jaccard_ml_spark.sources.tables import read_transcripts

    n_convs = max(500, int(40000 * sf)) if sf > 0 else 2000
    cache = f"/tmp/spark_graft_bench_tx_{n_convs}"
    if not os.path.exists(f"{cache}/transcripts.parquet"):
        generate_transcripts(cache, n_convs=n_convs, seed=42)
    tx = read_transcripts(spark, f"{cache}/transcripts.parquet")
    n_turns = tx.count()
    t0 = time.monotonic()
    res = dedup_pipeline(tx, DedupConfig())
    res.pairs.count()
    res.clusters.count()
    return time.monotonic() - t0, n_turns


def main() -> None:
    from jaccard_ml_spark.session import get_spark

    import __spark_entry__ as E

    spark = get_spark(master=f"local[{CPUS}]",
                      app_name="jaccard-ml-spark-bench",
                      shuffle_partitions=max(CPUS, 8))
    sf = _sf_from_dir(SF_DIR)
    qs = E.queries()
    times: dict[str, float] = {}
    from jaccard_ml_spark.operators.similarity import release_persisted

    for name in HEADLINE:
        t0 = time.monotonic()
        df = qs[name](spark, SF_DIR)
        df.write.format("noop").mode("overwrite").save()
        times[name] = round(time.monotonic() - t0, 3)
        # drop the similarity ops' cached vector tables between queries
        # so a bench loop can't accumulate executor storage (ADVICE r2)
        release_persisted()

    tx_sec, n_turns = _bench_transcripts(spark, sf)
    times["transcripts_dedup"] = round(tx_sec, 3)

    total = round(sum(times.values()), 3)
    print(json.dumps({
        "metric": "headline_queries_total_wall",
        "value": total,
        "unit": "sec",
        "queries": times,
        "sf": sf,
        "cpus": CPUS,
        "transcripts_turns": n_turns,
        "transcripts_turns_per_sec": round(n_turns / tx_sec, 1),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
