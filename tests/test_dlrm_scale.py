"""BASELINE config #5 smoke: 100M+-row row-sharded table (VERDICT r3 #3).

Runs benchmarks/dlrm_scale.py --mode mesh in a subprocess (it forces its
own 8-device CPU mesh): the full scheduled stack — row-sharded 100M-row
table, all-to-all pulls, planned flushes, per-worker caches — at the
scale axis the reference ships for
(`/root/reference/ps-lite/include/ps/partitioner.h:31-123`). Asserts
overflow 0, finite losses, and sane sizing. The canonical recorded
artifact is docs/dlrm_scale_report.json; the chip-mode run (12.8 GB
bf16 table) is recorded there too.

Scale test: ~2-3 minutes (dominated by the 100M-row table init on CPU);
set HERALD_SKIP_SCALE=1 to skip locally.
"""

import json
import os
import subprocess
import sys

import pytest

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.skipif(os.environ.get("HERALD_SKIP_SCALE") == "1",
                    reason="scale test skipped by env")
def test_100m_row_mesh_run_overflow_free():
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)   # the script sets its own device count
    out = subprocess.run(
        [sys.executable, os.path.join(HERE, "benchmarks", "dlrm_scale.py"),
         "--mode", "mesh", "--rows", "100000000", "--steps", "24"],
        capture_output=True, text=True, timeout=1200, env=env)
    assert out.returncode == 0, out.stderr[-2000:]
    rep = json.loads(out.stdout)
    assert rep["rows"] == 100_000_000
    assert rep["devices"] == 8
    assert rep["overflow_rows"] == 0
    assert rep["loss_finite"]
    assert rep["steps"] == 24
    # row sharding really is 100M/8 (+padding) per shard
    assert rep["sizing"]["rows_per_shard"] >= 100_000_000 // 8
    # the table dominates memory; cache+exchange buffers stay bounded
    assert rep["memory_gb"]["table"] > 3.0
    assert rep["memory_gb"]["cache"] < 0.1
