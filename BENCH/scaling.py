"""Scaling-efficiency evidence: identical job, identical input, two
cluster sizes — the sandbox substitute for N vs 4N executors mandated
by BASELINE.md §B.

Two modes (SCALING_MODE):

* ``local-cluster`` (default): Spark's multi-executor test master —
  ``local-cluster[n_exec, cores, mem]``. N executors vs 4N executors,
  each a SEPARATE JVM with its own heap, GC and Python workers,
  shuffling over localhost — the faithful analog of adding executor
  machines to a cluster (a single shared-JVM local[N] conflates
  executor scaling with allocator/GC contention inside one process).
* ``local``: the round-1 thread-scaling mode (local[N] vs local[4N]),
  kept for comparison.

Each level runs in a fresh subprocess (a JVM cannot change master
in-process); result JSON lines are parsed and the efficiency computed:

    efficiency = (throughput_4N / throughput_N) / 4

The sandbox host is co-tenant (steal time measured 0-16% varying by
the minute), so levels are interleaved over SCALING_ROUNDS rounds and
each level takes its best round — the least-contended sample — plus a
spin-loop capacity probe immediately before each run for a
capacity-adjusted figure. Also asserts pair/cluster equality across
levels (correctness determinism). Writes BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = r"""
import json, os, sys, time
os.environ.setdefault("SPARK_HOME", "/opt/spark")
sys.path.insert(0, %(repo)r)
from jaccard_ml_spark.config import DedupConfig
from jaccard_ml_spark.plans.pipeline import dedup_pipeline
from jaccard_ml_spark.session import get_spark
from jaccard_ml_spark.sources.tables import read_transcripts

mode = sys.argv[1]
n_exec = int(sys.argv[2])          # executors (local-cluster) or cores (local)
tx_path = sys.argv[3]
CORES_PER_EXEC = int(os.environ.get("SCALING_CORES_PER_EXEC", "4"))
MEM_PER_EXEC_MB = int(os.environ.get("SCALING_MEM_PER_EXEC_MB", "6144"))

if mode == "local-cluster":
    master = f"local-cluster[{n_exec},{CORES_PER_EXEC},{MEM_PER_EXEC_MB}]"
    total_cores = n_exec * CORES_PER_EXEC
    extra = {"spark.executor.memory": f"{MEM_PER_EXEC_MB}m",
             "spark.python.worker.memory": "1024m",
             # executor-side Python workers must import the package
             # (spark-submit --py-files does this on a real cluster)
             "spark.executorEnv.PYTHONPATH": %(repo)r}
else:
    master = f"local[{n_exec}]"
    total_cores = n_exec
    extra = {}

spark = get_spark(master=master, shuffle_partitions=max(total_cores, 8),
                  app_name=f"scaling-{mode}-{n_exec}", extra_conf=extra)
tx = read_transcripts(spark, tx_path)
n_turns = tx.count()
# spread the input across the task slots before timing: a single
# parquet file's row-group count would otherwise cap the map-side
# parallelism of the first stage at every level (a production
# multi-file Iceberg table is naturally wide)
tx = tx.repartition(total_cores * 2).persist(); tx.count()

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
    "level": n_exec, "master": master, "turns": n_turns, "pairs": n_pairs,
    "wall_sec": round(wall, 2),
    "turns_per_sec": round(n_turns / wall, 1),
    "result_hash": h,
}))
spark.stop()
"""


def run_level(mode: str, level: int, tx_path: str) -> dict:
    script = WORKER % {"repo": REPO}
    out = subprocess.run(
        [sys.executable, "-c", script, mode, str(level), tx_path],
        capture_output=True, text=True, timeout=3600, check=False)
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError(f"worker {mode}/{level} failed:\n{out.stdout[-2000:]}\n"
                       f"{out.stderr[-4000:]}")


def spin_capacity(n: int, seconds: float = 2.0) -> int:
    """Total spin-loop iterations achievable by n concurrent processes
    right now — a point sample of the co-tenant host's free capacity."""
    import multiprocessing as mp
    import time as _t

    def spin(q):
        t_end = _t.time() + seconds
        c = 0
        while _t.time() < t_end:
            for _ in range(10000):
                pass
            c += 1
        q.put(c)

    q = mp.Queue()
    ps = [mp.Process(target=spin, args=(q,)) for _ in range(n)]
    [p.start() for p in ps]
    total = sum(q.get() for _ in ps)
    [p.join() for p in ps]
    return total


def main() -> None:
    n_convs = int(os.environ.get("SCALING_N_CONVS", "240000"))
    tx_dir = f"/tmp/spark_graft_scaling_v2_{n_convs}"
    if not os.path.exists(f"{tx_dir}/transcripts.parquet"):
        sys.path.insert(0, REPO)
        from jaccard_ml_spark.sources.generator import generate_transcripts
        generate_transcripts(tx_dir, n_convs=n_convs, seed=42)
    tx_path = f"{tx_dir}/transcripts.parquet"

    mode = os.environ.get("SCALING_MODE", "local-cluster")
    lo, hi = (int(x) for x in
              os.environ.get("SCALING_LEVELS", "1,4").split(","))
    assert hi == 4 * lo, "levels must be N and 4N"
    cores_per = int(os.environ.get("SCALING_CORES_PER_EXEC", "4"))
    rounds = int(os.environ.get("SCALING_ROUNDS", "3"))
    if mode == "local":
        cores_lo, cores_hi = lo, hi
    else:
        cores_lo, cores_hi = lo * cores_per, hi * cores_per

    best: dict[int, dict] = {}
    for rnd in range(rounds):
        for level, cores in ((lo, cores_lo), (hi, cores_hi)):
            cap = spin_capacity(cores)
            r = run_level(mode, level, tx_path)
            r["spin_capacity"] = cap
            print(f"round {rnd} {mode}[{level}] ({cores} cores): "
                  f"{r['wall_sec']}s ({r['turns_per_sec']} turns/s, "
                  f"spin cap {cap})", flush=True)
            if level not in best or (r["turns_per_sec"]
                                     > best[level]["turns_per_sec"]):
                best[level] = r
            assert r["result_hash"] == best[level]["result_hash"]
    rlo, rhi = best[lo], best[hi]
    eff = (rhi["turns_per_sec"] / rlo["turns_per_sec"]) / 4.0
    eff_adj = ((rhi["turns_per_sec"] / rhi["spin_capacity"])
               / (rlo["turns_per_sec"] / rlo["spin_capacity"]))
    same = rlo["result_hash"] == rhi["result_hash"]
    report = {
        f"{mode}_{lo}": rlo, f"{mode}_{hi}": rhi,
        "scaling_efficiency": round(eff, 3),
        "capacity_adjusted_efficiency": round(eff_adj, 3),
        "results_identical": same,
    }
    print(json.dumps(report, indent=2))

    unit = ("executors" if mode == "local-cluster" else "task threads")
    md = f"""# BENCH/BASELINE — measured results

## Scaling efficiency (N vs 4N {unit}; sandbox substitute for
## N vs 4N executors per BASELINE.md §B)

Mode **{mode}**: level N = `{rlo['master']}`, level 4N =
`{rhi['master']}`{' — each executor a separate JVM with its own heap,'
' GC and Python workers, shuffling over localhost (the faithful'
' analog of adding executor machines)' if mode == 'local-cluster'
 else ''}.

Input: deterministic synthetic transcripts, {rlo['turns']} turns
({n_convs} conversations), seed 42. Identical job and input at both
levels; input pre-materialized (persist) so only pipeline compute is
timed. Each level is the best of {rounds} interleaved rounds (the
sandbox host is co-tenant: steal time fluctuates 0-16% minute to
minute — best-of-N per level samples the least-contended run).

| level | master | wall (s) | throughput (turns/s) | result hash |
|---|---|---|---|---|
| N  | `{rlo['master']}` | {rlo['wall_sec']} | {rlo['turns_per_sec']} | `{rlo['result_hash']}` |
| 4N | `{rhi['master']}` | {rhi['wall_sec']} | {rhi['turns_per_sec']} | `{rhi['result_hash']}` |

**Scaling efficiency = (throughput_4N / throughput_N) / 4 =
{round(eff, 3)}** (target ≥ 0.8).
Capacity-adjusted efficiency (each level's throughput normalized by a
spin-loop sample of the co-tenant host's free capacity taken
immediately before that run, spin({cores_lo} procs)={rlo['spin_capacity']},
spin({cores_hi} procs)={rhi['spin_capacity']}): **{round(eff_adj, 3)}**.

Results identical across cluster sizes: **{same}** (sha256 of the
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
