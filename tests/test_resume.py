"""Mid-epoch resume / elastic restart (VERDICT r1 item 3).

The TPU failure-recovery story replacing the reference's Van heartbeat +
single-node rejoin (`ps-lite/src/van.cc:104-116`): periodic checkpoint of
the FULL CachedTrainState (device cache arrays included) + deterministic
planner fast-forward. A killed-and-restarted run must reproduce the
uninterrupted run's final tables BIT-exactly (SGD; every op sequence
identical).
"""

import numpy as np
import pytest

import jax

from herald_tpu import HeraldConfig
from herald_tpu.data import synthetic_ctr_data
from herald_tpu.models import get_model
from herald_tpu.train.cached import CachedEngine
from herald_tpu.train.checkpoint import load_checkpoint, save_checkpoint

ROWS = 1000
B = 8
S = 8
STEPS = 12
KILL_AT = 5          # deliberately NOT a scan-chunk boundary


def _cfg():
    return HeraldConfig(model="wdl_criteo", batch_size=B, embedding_dim=8,
                        comm_mode="hybrid", learning_rate=0.5,
                        cache_limit_ratio=0.5, pinned_rows=16)


def _data():
    model = get_model("wdl_criteo")
    return synthetic_ctr_data(model.spec, B * S * STEPS, seed=4,
                              num_rows=ROWS)


def _run(eng, planner, state, steps):
    for _ in range(steps):
        state, stats = eng.train_step_cached(state, planner, *_DATA)
        assert stats is not None
        assert int(np.asarray(stats["overflow"]).sum()) == 0
    return state


_DATA = None


@pytest.fixture(scope="module", autouse=True)
def _setup():
    global _DATA
    if jax.device_count() < S:
        pytest.skip("needs 8 virtual devices")
    _DATA = _data()


def test_kill_and_restart_bitexact(tmp_path):
    # ---- uninterrupted run ----
    eng_a = CachedEngine(_cfg(), table_rows=ROWS)
    pl_a = eng_a.make_planner(_DATA[1], epochs=1, n_threads=1)
    st_a = _run(eng_a, pl_a, eng_a.init_cached_state(0), STEPS)
    st_a = eng_a.sync_cache(st_a, pl_a)
    pl_a.close()

    # ---- run B: train KILL_AT steps, checkpoint, "crash" ----
    eng_b = CachedEngine(_cfg(), table_rows=ROWS)
    pl_b = eng_b.make_planner(_DATA[1], epochs=1, n_threads=1)
    st_b = _run(eng_b, pl_b, eng_b.init_cached_state(0), KILL_AT)
    save_checkpoint(st_b, str(tmp_path / "ck"))
    del st_b, eng_b
    pl_b.close()    # the crash loses the planner and all device state

    # ---- restart: fresh engine + planner, load, fast-forward, finish ----
    eng_c = CachedEngine(_cfg(), table_rows=ROWS)
    pl_c = eng_c.make_planner(_DATA[1], epochs=1, n_threads=1)
    st_c = load_checkpoint(str(tmp_path / "ck"),
                           eng_c.init_cached_state(7))
    assert int(st_c.step) == KILL_AT
    assert pl_c.fast_forward(KILL_AT) == KILL_AT
    st_c = _run(eng_c, pl_c, st_c, STEPS - KILL_AT)
    st_c = eng_c.sync_cache(st_c, pl_c)
    pl_c.close()

    # bit-exact equality of every state leaf (SGD: identical op sequences)
    for (pa, a), (pc, c) in zip(
            jax.tree_util.tree_flatten_with_path(st_a)[0],
            jax.tree_util.tree_flatten_with_path(st_c)[0]):
        assert pa == pc
        np.testing.assert_array_equal(np.asarray(a), np.asarray(c),
                                      err_msg=str(pa))


def test_cli_resume_continues_not_replays(tmp_path):
    """CLI --resume continues from the saved step (Weak #6: it used to
    rebuild a fresh planner and double-train from batch 0)."""
    from herald_tpu.launch.cli import build_parser, run_training

    common = ["--model", "wdl_criteo", "--comm", "local", "--scheduled",
              "--batch-size", "16", "--samples", "2048", "--rows", "800",
              "--cache-limit-ratio", "0.6", "--lr", "0.5",
              "--scan-steps", "4", "--val-ratio", "0.25",
              "--seed", "3", "--nepoch", "1"]
    # uninterrupted
    full = run_training(build_parser().parse_args(common))
    # interrupted at step 5 (mid scan chunk), then resumed
    ck = str(tmp_path / "ck")
    part = run_training(build_parser().parse_args(
        common + ["--max-steps", "5", "--ckpt", ck]))
    assert part["stopped_early"] and part["val_auc"] is None
    assert part["steps"] == 5
    rest = run_training(build_parser().parse_args(
        common + ["--resume", ck]))
    assert not rest["stopped_early"]
    # resumed run trained only the REMAINING steps...
    assert rest["steps"] == full["steps"] - 5
    # ...and lands on the identical model (same data, same seeds, SGD)
    assert rest["val_auc"] == pytest.approx(full["val_auc"], abs=1e-12)
    assert rest["val_acc"] == pytest.approx(full["val_acc"], abs=1e-12)
