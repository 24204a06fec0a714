"""Scaling-efficiency evidence: identical job, identical input, two
parallelism levels (local[8] vs local[32]) — the sandbox substitute for
N vs 4N executors mandated by BASELINE.md §B.

Each level runs in a fresh subprocess (a JVM cannot change master
in-process); result JSON lines are parsed and the efficiency computed:

    efficiency = (throughput_32 / throughput_8) / 4

Also asserts pair/cluster equality across levels (correctness
determinism). Writes BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = r"""
import json, os, sys, time
sys.path.insert(0, %(repo)r)
from jaccard_ml_spark.config import DedupConfig
from jaccard_ml_spark.plans.pipeline import dedup_pipeline
from jaccard_ml_spark.session import get_spark
from jaccard_ml_spark.sources.tables import read_transcripts

cores = int(sys.argv[1])
tx_path = sys.argv[2]
spark = get_spark(master=f"local[{cores}]", shuffle_partitions=max(cores, 8),
                  app_name=f"scaling-{cores}")
tx = read_transcripts(spark, tx_path)
n_turns = tx.count()
tx = tx.persist(); tx.count()        # exclude input materialization

t0 = time.monotonic()
res = dedup_pipeline(tx, DedupConfig())
n_pairs = res.pairs.count()
res.clusters.count()
wall = time.monotonic() - t0

pair_sig = sorted((r.id_a, r.id_b) for r in
                  res.pairs.select("id_a", "id_b").collect())
clus_sig = sorted((r.id, r.cluster_id) for r in res.clusters.collect())
import hashlib
h = hashlib.sha256(repr((pair_sig, clus_sig)).encode()).hexdigest()[:16]
print("RESULT " + json.dumps({
    "cores": cores, "turns": n_turns, "pairs": n_pairs,
    "wall_sec": round(wall, 2),
    "turns_per_sec": round(n_turns / wall, 1),
    "result_hash": h,
}))
spark.stop()
"""


def run_level(cores: int, tx_path: str) -> dict:
    script = WORKER % {"repo": REPO}
    out = subprocess.run(
        [sys.executable, "-c", script, str(cores), tx_path],
        capture_output=True, text=True, timeout=3600, check=False)
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError(f"worker {cores} failed:\n{out.stdout[-2000:]}\n"
                       f"{out.stderr[-4000:]}")


def main() -> None:
    n_convs = int(os.environ.get("SCALING_N_CONVS", "8000"))
    tx_dir = f"/tmp/spark_graft_scaling_tx_{n_convs}"
    if not os.path.exists(f"{tx_dir}/transcripts.parquet"):
        sys.path.insert(0, REPO)
        from jaccard_ml_spark.sources.generator import generate_transcripts
        generate_transcripts(tx_dir, n_convs=n_convs, seed=42)
    tx_path = f"{tx_dir}/transcripts.parquet"

    r8 = run_level(8, tx_path)
    r32 = run_level(32, tx_path)
    eff = (r32["turns_per_sec"] / r8["turns_per_sec"]) / 4.0
    same = r8["result_hash"] == r32["result_hash"]
    report = {
        "local8": r8, "local32": r32,
        "scaling_efficiency": round(eff, 3),
        "results_identical": same,
    }
    print(json.dumps(report, indent=2))

    md = f"""# BENCH/BASELINE — measured results

## Scaling efficiency (N vs 4N parallelism; sandbox substitute for
## N vs 4N executors per BASELINE.md §B)

Input: deterministic synthetic transcripts, {r8['turns']} turns
({n_convs} conversations), seed 42. Identical job and input at both
levels; input pre-materialized (persist) so only pipeline compute is
timed.

| level | wall (s) | throughput (turns/s) | result hash |
|---|---|---|---|
| local[8]  | {r8['wall_sec']} | {r8['turns_per_sec']} | `{r8['result_hash']}` |
| local[32] | {r32['wall_sec']} | {r32['turns_per_sec']} | `{r32['result_hash']}` |

**Scaling efficiency = (throughput_32 / throughput_8) / 4 =
{round(eff, 3)}** (target ≥ 0.8)

Results identical across parallelism levels: **{same}** (sha256 of the
sorted pair + cluster assignments).

## Dup-pair recall vs oracle

Recall/precision vs the brute-force exact oracle is asserted ≥ 0.99 /
== 1.0 in `tests/test_pipeline_recall.py` (measured 1.0 / 1.0 at the
pinned config on the planted-duplicate fixtures at two seeds).
"""
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "w") as f:
        f.write(md)
    if eff < 0.8:
        print(f"WARNING: efficiency {eff:.3f} < 0.8")


if __name__ == "__main__":
    main()
