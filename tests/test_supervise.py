"""Elastic supervisor: crash -> restart-from-checkpoint -> identical model.

The TPU recovery unit is the job (an SPMD program is all-or-nothing), so
the analog of the reference's Van dead-node rejoin
(`ps-lite/src/van.cc:48-116`) is: periodic checkpoint + supervisor
relaunch + deterministic resume. Fault injection via the CLI's
--crash-after (the reference has no fault-injection harness, SURVEY §5).
"""

import json
import os
import subprocess
import sys

import numpy as np


def _run(args, env):
    out = subprocess.run([sys.executable, "-m", *args],
                         capture_output=True, text=True, env=env,
                         timeout=420)
    return out


def test_supervisor_recovers_crashed_run(tmp_path):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    env["PYTHONPATH"] = repo
    env["JAX_PLATFORMS"] = ""          # let the CLI pick
    child = ["--model", "wdl_criteo", "--comm", "local", "--scheduled",
             "--batch-size", "16", "--samples", "1024", "--rows", "800",
             "--cache-limit-ratio", "0.6", "--lr", "0.5",
             "--nepoch", "1", "--scan-steps", "2", "--val-ratio", "0.25",
             "--seed", "3", "--platform", "cpu"]

    # uninterrupted oracle
    ref = _run(["herald_tpu.launch", *child], env)
    assert ref.returncode == 0, ref.stdout[-2000:] + ref.stderr[-2000:]
    def last_report(out):
        idx = out.rindex('"model"')
        return json.loads(out[out.rindex("{", 0, idx):])

    ref_rep = last_report(ref.stdout)

    # supervised run that crashes at step 6 (checkpoint every 4)
    sup = _run(["herald_tpu.launch.supervise",
                "--ckpt-dir", str(tmp_path / "ck"),
                "--ckpt-every", "4", "--backoff", "0.1", "--",
                *child, "--crash-after", "6"], env)
    assert sup.returncode == 0, sup.stdout[-2000:] + sup.stderr[-2000:]
    assert '"crashed_at": 6' in sup.stdout
    assert "restarting from checkpoint" in sup.stderr
    # final report comes from the resumed child
    rep = last_report(sup.stdout)
    assert not rep["stopped_early"]
    # resumed from step 4: trained the remaining steps only
    assert rep["steps"] == ref_rep["steps"] - 4
    # deterministic SGD: the recovered model equals the uninterrupted one
    assert rep["val_auc"] == ref_rep["val_auc"]
    assert rep["val_acc"] == ref_rep["val_acc"]


def test_supervisor_gives_up_after_max_restarts(tmp_path):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env["PYTHONPATH"] = repo
    out = subprocess.run(
        [sys.executable, "-m", "herald_tpu.launch.supervise",
         "--ckpt-dir", str(tmp_path / "ck"), "--max-restarts", "2",
         "--backoff", "0.05", "--", "--model", "no_such_model",
         "--platform", "cpu"],
        capture_output=True, text=True, env=env, timeout=300)
    assert out.returncode != 0
    assert out.stderr.count("launch (attempt") == 3   # 1 + 2 restarts
    assert "giving up" in out.stderr
