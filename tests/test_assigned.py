"""Assignment-only scheduled mode (VERDICT r1 item 7): the plain engine
fed by csrc/herald_sched.cc affinity placement, no cache.

Key invariant (SURVEY §7 hard-parts: "AUC parity under sample
re-assignment"): scheduling changes WHICH worker sees which sample, never
the global batch set — so losses and the final model must match the
baseline up to fp reordering.
"""

import numpy as np
import pytest

import jax

from herald_tpu import HeraldConfig
from herald_tpu.data import synthetic_ctr_data
from herald_tpu.models import get_model
from herald_tpu.sched.scheduler import NativeScheduler
from herald_tpu.train.engine import Engine

S, B, ROWS, STEPS = 8, 16, 4096, 6


def test_assigned_matches_baseline_global_batch():
    if jax.device_count() < S:
        pytest.skip("needs 8 virtual devices")
    model = get_model("wdl_criteo")
    dense, sparse, labels = synthetic_ctr_data(
        model.spec, S * B * STEPS, seed=9, num_rows=ROWS)
    cfg = HeraldConfig(model="wdl_criteo", batch_size=B, embedding_dim=8,
                       comm_mode="hybrid", learning_rate=0.5,
                       a2a_capacity_factor=8.0)

    e_base = Engine(cfg, table_rows=ROWS)
    s_base, st_b = e_base.init_state(0), None
    s_base, st_b = e_base.train_epoch(s_base, dense, sparse, labels,
                                      steps=STEPS)

    e_asgn = Engine(cfg, table_rows=ROWS)
    s_asgn = e_asgn.init_state(0)
    sched = NativeScheduler(sparse, nrank=S, batch_size=B,
                            batch_num=STEPS, epochs=1,
                            cache_size=ROWS, n_threads=1)
    sched.start()
    s_asgn, st_a = e_asgn.train_epoch_assigned(s_asgn, sched, dense,
                                               sparse, labels, steps=STEPS)
    sched.close()

    # identical per-step global-batch losses (the batch SET per step is
    # unchanged; only the split across workers moves)
    np.testing.assert_allclose(np.asarray(st_b["loss"]),
                               np.asarray(st_a["loss"]), rtol=1e-5)
    assert int(np.asarray(st_a["overflow"]).sum()) == 0
    # identical final model (fp-reorder tolerance)
    for k in s_base.dense:
        np.testing.assert_allclose(np.asarray(s_base.dense[k]),
                                   np.asarray(s_asgn.dense[k]),
                                   rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(s_base.table),
                               np.asarray(s_asgn.table),
                               rtol=1e-3, atol=1e-5)


def test_affinity_reduces_uniques_on_shuffled_sessions():
    """On a shuffled user-sessionized stream, affinity placement regroups
    a user's events onto the worker caching their ids — fewer uniques per
    worker batch (the reference's user-locality win; iid streams give the
    scheduler nothing, and contiguous batching already captures UNshuffled
    session locality)."""
    model = get_model("wdl_criteo")
    _, sparse, _ = synthetic_ctr_data(model.spec, S * 64 * 24, seed=0,
                                      num_rows=262144, session_len=16)
    sparse = sparse[np.random.default_rng(1).permutation(len(sparse))]
    gb = S * 64
    u_base = [len(np.unique(sparse[s * gb:(s + 1) * gb]
                            [z * 64:(z + 1) * 64]))
              for s in range(24) for z in range(S)]
    sched = NativeScheduler(sparse, nrank=S, batch_size=64, batch_num=24,
                            epochs=1, cache_size=26214, n_threads=1)
    sched.start()
    u_asgn = []
    while True:
        r = sched.pop()
        if r is None:
            break
        assign, _ = r
        u_asgn.extend(len(np.unique(sparse[assign[z]].ravel()))
                      for z in range(S))
    sched.close()
    assert np.mean(u_base) / np.mean(u_asgn) > 1.03


def test_cli_assign_only_mode():
    from herald_tpu.launch.cli import build_parser, run_training
    rep = run_training(build_parser().parse_args(
        ["--model", "wdl_criteo", "--comm", "local", "--assign-only",
         "--batch-size", "16", "--samples", "1024", "--rows", "800",
         "--lr", "0.5", "--nepoch", "1", "--scan-steps", "4",
         "--val-ratio", "0.25", "--cache-limit-ratio", "0.6"]))
    assert rep["mode"] == "assigned"
    assert rep["steps"] > 0 and rep["overflow_rows"] == 0
    assert "sched" in rep and rep["sched"]["miss_pull"] >= 0
