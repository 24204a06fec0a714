"""Efficiency CURVE measurement: the same job at 1, 2 and 4 executors.

The main harness (BENCH/scaling.py) measures the north-rule pair
(N=1 vs 4N=4 executors x 4 cores). This companion interleaves a MID
level (2 executors) into the same gated protocol, because the two-point
number cannot distinguish "the plan stops scaling" from "the box's
shared resource saturates with stream count". The curve can:

* plan defect (serial fraction / skew): efficiency loss is roughly
  level-independent — eff(1->2) is about as bad as eff(2->4);
* shared-bandwidth ceiling: eff(1->2) stays near 1 while eff(2->4)
  drops toward the measured per-stream DRAM bound (the r4 stage-level
  diagnosis: per-stream bandwidth at 16 streams is 0.71x of 4-stream
  on this box — BENCH/BASELINE.md "Where the residual gap lives").

Runs are weather-gated and post-validated exactly like the main
harness (its wait_for_quiet_host / probe gates are imported, not
reimplemented); every run's result hash must be identical across all
three levels. Samples persist incrementally to
BENCH/scaling_curve_runs.json (accumulating across sessions); the
report prints best-of-level throughput and the three pairwise
efficiencies, normalized per core ratio.

Usage:  python BENCH/scaling_curve.py         # measure (1 round = 4,2,1)
        python BENCH/scaling_curve.py report  # report from persisted runs
Env:    SCALING_N_CONVS / SCALING_ROUNDS / SCALING_PROBE_BEST as in
        BENCH/scaling.py (defaults: 5760000 convs ~ 45M turns, 1 round).
"""
from __future__ import annotations

import json
import os
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
sys.path.insert(0, HERE)
sys.path.insert(0, REPO)

LEVELS = (4, 2, 1)          # short runs first inside each round
CORES_PER_EXEC = 4
RUNS_PATH = os.path.join(HERE, "scaling_curve_runs.json")


def _load() -> dict[int, list[dict]]:
    runs: dict[int, list[dict]] = {lv: [] for lv in LEVELS}
    if os.path.exists(RUNS_PATH):
        with open(RUNS_PATH) as f:
            for k, v in json.load(f).items():
                runs.setdefault(int(k), []).extend(v)
    return runs


def _save(runs: dict[int, list[dict]]) -> None:
    with open(RUNS_PATH, "w") as f:
        json.dump({str(k): v for k, v in runs.items()}, f, indent=1)


def report(runs: dict[int, list[dict]] | None = None) -> dict:
    runs = runs or _load()
    n_convs = int(os.environ.get("SCALING_N_CONVS", "5760000"))
    from scaling import _same_config
    view = {lv: [r for r in rs if _same_config(r, n_convs)]
            for lv, rs in runs.items()}
    # levels 1/4 also merge the MAIN record's clean samples
    # (BENCH/scaling_runs.json): identical worker, part floor, gating
    # and persistence format, so best-of-level over the union is the
    # best quiet-window estimate of each level on this host
    main_path = os.path.join(HERE, "scaling_runs.json")
    if os.path.exists(main_path):
        with open(main_path) as f:
            for k, v in json.load(f).items():
                if int(k) in view:
                    view[int(k)].extend(
                        r for r in v if _same_config(r, n_convs))
    out: dict = {"samples": {lv: len(v) for lv, v in view.items()}}
    have = [lv for lv in sorted(LEVELS) if view.get(lv)]
    best = {lv: max(view[lv], key=lambda r: r["turns_per_sec"])
            for lv in have}
    out["best_per_level"] = {lv: {"wall_sec": best[lv]["wall_sec"],
                                  "turns_per_sec":
                                  best[lv]["turns_per_sec"]}
                             for lv in have}
    hashes = {best[lv]["result_hash"] for lv in have}
    out["result_hash_identical"] = len(hashes) <= 1

    # Efficiency ratios are computed WITHIN one round (one harness
    # launch's back-to-back window — samples share a round_tag), never
    # across pools: host weather swings >2x day to day, so a clean-day
    # numerator over a degraded-day denominator fabricates arbitrary
    # ratios. Untagged curve samples (pre-tag sessions) are excluded
    # from ratios; the main record's 1/4 samples carry no tag and
    # likewise only inform best_per_level above.
    rounds: dict[str, dict[int, dict]] = {}
    for lv, rs in view.items():
        for r in rs:
            tag = r.get("round_tag")
            if tag:
                cur = rounds.setdefault(tag, {})
                if (lv not in cur
                        or r["turns_per_sec"]
                        > cur[lv]["turns_per_sec"]):
                    cur[lv] = r
    out["rounds"] = {}
    headline, headline_score = None, -1.0
    for tag, by_lv in sorted(rounds.items()):
        entry = {"levels": {lv: by_lv[lv]["turns_per_sec"]
                            for lv in sorted(by_lv)}}
        for a, b in [(1, 2), (2, 4), (1, 4)]:
            if a in by_lv and b in by_lv:
                e = (by_lv[b]["turns_per_sec"]
                     / by_lv[a]["turns_per_sec"]) / (b / a)
                entry[f"eff_{a}to{b}"] = round(e, 3)
        out["rounds"][tag] = entry
        # the least-contended complete round headlines: weather is
        # one-sided, so the round whose SLOWEST per-core throughput is
        # highest had the quietest window overall
        if len(by_lv) == len(LEVELS):
            score = min(r["turns_per_sec"] / (lv * CORES_PER_EXEC)
                        for lv, r in by_lv.items())
            if score > headline_score:
                headline, headline_score = tag, score
    out["headline_round"] = headline
    print(json.dumps(out, indent=1))
    return out


def main() -> None:
    import scaling as S
    from jaccard_ml_spark.sources.generator import (
        ensure_generated,
        generate_transcripts_sharded,
    )

    n_convs = int(os.environ.get("SCALING_N_CONVS", "5760000"))
    rounds = int(os.environ.get("SCALING_ROUNDS", "1"))
    # identical work granularity at every level: floor = top level's
    # cores * 2, matching the main harness's level-independent floor
    os.environ.setdefault("SCALING_PART_FLOOR",
                          str(max(LEVELS) * CORES_PER_EXEC * 2))
    seed_probe = float(os.environ.get("SCALING_PROBE_BEST", "0"))
    if seed_probe > 0:
        S.wait_for_quiet_host._best_probe = seed_probe

    tx_dir = f"/tmp/spark_graft_scaling_v3_{n_convs}"
    ensure_generated(tx_dir, generate_transcripts_sharded,
                     n_convs=n_convs, seed=42, n_shards=32)
    tx_path = f"{tx_dir}/transcripts.parquet"

    # SCALING_CURVE_LEVELS=2 (comma-separated) re-measures only the
    # named levels — the report takes best-of-level, so topping up the
    # level with the weakest clean-sample pool is the cheapest way to
    # tighten the curve on a choppy-weather day
    levels = tuple(
        int(x) for x in os.environ.get(
            "SCALING_CURVE_LEVELS",
            ",".join(map(str, LEVELS))).split(","))
    import time as _t
    session = f"s{int(_t.time())}"
    runs = _load()
    for rnd in range(rounds):
        for level in levels:
            for att in range(3):
                pre_steal = S.wait_for_quiet_host()
                r = S.run_level("local-cluster", level, tx_path)
                r["n_convs"] = n_convs
                # levels of one round run back-to-back in one weather
                # window; the report ratios within a tag, never across
                # days (cross-day best-of mixes weather regimes: a
                # clean-day L1 against a degraded-day L2 fabricates
                # eff(1->2) ~ 0.5)
                r["round_tag"] = f"{session}-r{rnd}"
                r["pre_steal"] = round(pre_steal, 4)
                r["pre_probe"] = round(
                    getattr(S.wait_for_quiet_host, "_last_probe", -1.0), 3)
                r["post_steal"] = round(S.steal_fraction(3.0), 4)
                r["post_probe"] = round(S.probe_min3(), 3)
                best_probe = getattr(S.wait_for_quiet_host, "_best_probe",
                                     None) or r["pre_probe"]
                r["weather_polluted"] = bool(
                    r["post_probe"] > max(best_probe, 0.01) * 2.0)
                print(f"curve round {rnd} level {level} attempt {att}: "
                      f"{r['wall_sec']}s ({r['turns_per_sec']} turns/s, "
                      f"probe {r['pre_probe']}s->{r['post_probe']}s"
                      f"{', POLLUTED' if r['weather_polluted'] else ''})",
                      flush=True)
                # reload-merge before save: the file may have gained
                # annotations (round tags, pollution provenance) since
                # launch — writing the launch-time snapshot back would
                # silently drop them (bit us once)
                runs = _load()
                runs.setdefault(level, []).append(r)
                _save(runs)
                if not r["weather_polluted"]:
                    break
    report(runs)


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "report":
        report()
    else:
        main()
