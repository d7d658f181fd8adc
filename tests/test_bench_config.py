"""Pin the secondary-config benchmark script's output schema so the
recorded numbers (docs/secondary_bench.json) cannot rot silently
(VERDICT r2 weak #8): both modes run end-to-end at tiny shapes on CPU
and must emit the JSON line the artifact records."""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(extra):
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "benchmarks",
                                      "bench_config.py"),
         "--model", "wdl_criteo", "--batch-size", "16",
         "--embedding-size", "8", "--rows", "8000", "--iters", "8",
         "--platform", "cpu"] + extra,
        capture_output=True, text=True, timeout=420)
    assert out.returncode == 0, out.stderr[-2000:]
    return json.loads(out.stdout.strip().splitlines()[-1])


def test_bench_config_plain_schema():
    rec = _run([])
    assert rec["metric"] == "wdl_criteo_b16_e8_examples_per_sec_per_chip"
    assert rec["value"] > 0 and rec["rows"] == 8000
    assert rec["us_per_step"] > 0


def test_bench_config_scheduled_schema():
    rec = _run(["--scheduled"])
    assert rec["metric"] == "wdl_criteo_b16_e8_scheduled_eps_per_chip"
    assert rec["value"] > 0 and rec["rows"] == 8000


def test_bench_config_scheduled_live_schema():
    rec = _run(["--scheduled", "--live"])
    assert rec["metric"] == "wdl_criteo_b16_e8_scheduled_eps_per_chip"
    assert rec["value"] > 0 and rec["rows"] == 8000
