"""Plan tape record/replay (sched/replay.py): training from a recorded
micro-program tape must be bit-identical to training from the live
planner — same programs, same dirty dump, same counters — and the tape
cache must miss (re-record) whenever a program-shaping knob changes."""

import numpy as np
import pytest

import jax

from herald_tpu import HeraldConfig
from herald_tpu.data import synthetic_ctr_data
from herald_tpu.models import get_model
from herald_tpu.sched.replay import ReplayPlanner, plan_cache, plan_key
from herald_tpu.train.cached import CachedEngine

ROWS = 900
B = 16
STEPS = 12


def _setup(**kw):
    base = dict(model="wdl_criteo", batch_size=B, embedding_dim=8,
                comm_mode="local", learning_rate=0.5,
                cache_limit_ratio=0.6)
    cfg = HeraldConfig(**{**base, **kw})
    model = get_model(cfg.model)
    dense, sparse, labels = synthetic_ctr_data(model.spec, B * STEPS,
                                               seed=9, num_rows=ROWS)
    eng = CachedEngine(cfg, table_rows=ROWS)
    return eng, dense, sparse, labels


def _train(eng, planner, dense, sparse, labels):
    st = eng.init_cached_state(0)
    done = 0
    while True:
        st, stats = eng.train_epoch_cached(st, planner, dense, sparse,
                                           labels, steps=5)
        if stats is None:
            break
        assert int(np.asarray(stats["overflow"]).sum()) == 0
        done += len(np.asarray(stats["loss"]))
    st = eng.sync_cache(st, planner)
    return st, done


def test_replay_bit_exact_and_cache_hit(tmp_path):
    eng, dense, sparse, labels = _setup()
    live = eng.make_planner(sparse, epochs=1, n_threads=1)
    live_perf_planner = eng.make_planner(sparse, epochs=1, n_threads=1)
    st_live, n_live = _train(eng, live, dense, sparse, labels)
    live.close()

    tape = str(tmp_path / "tape")
    rp = plan_cache(eng, sparse, tape, epochs=1, n_threads=1)
    assert isinstance(rp, ReplayPlanner)
    st_tape, n_tape = _train(eng, rp, dense, sparse, labels)
    assert n_tape == n_live == STEPS
    np.testing.assert_array_equal(np.asarray(st_live.table),
                                  np.asarray(st_tape.table))
    np.testing.assert_array_equal(np.asarray(st_live.cache),
                                  np.asarray(st_tape.cache))
    # counters carried through the tape match the live planner's finals
    live_perf_planner.fast_forward(10**9)
    assert rp.perf() == live_perf_planner.perf()
    live_perf_planner.close()

    # second call: replay hit (no re-record — meta timestamp unchanged)
    import os
    mt = os.path.getmtime(tmp_path / "tape" / "meta.json")
    rp2 = plan_cache(eng, sparse, tape, epochs=1, n_threads=1)
    assert os.path.getmtime(tmp_path / "tape" / "meta.json") == mt
    st2, _ = _train(eng, rp2, dense, sparse, labels)
    np.testing.assert_array_equal(np.asarray(st_live.table),
                                  np.asarray(st2.table))


def test_tape_key_misses_on_program_shaping_knobs(tmp_path):
    eng, dense, sparse, labels = _setup()
    k0 = plan_key(sparse, eng.cfg, 1, eng.num_rows)
    # lr does NOT shape programs -> same key (tape survives lr sweeps)
    eng_lr, *_ = _setup(learning_rate=0.01)
    assert plan_key(sparse, eng_lr.cfg, 1, eng_lr.num_rows) == k0
    # cache size DOES -> different key
    eng_c, *_ = _setup(cache_limit_ratio=0.5)
    assert plan_key(sparse, eng_c.cfg, 1, eng_c.num_rows) != k0
    # and a stale tape re-records instead of replaying wrong programs
    tape = str(tmp_path / "tape")
    plan_cache(eng, sparse, tape, epochs=1, n_threads=1).close()
    rp = plan_cache(eng_c, sparse, tape, epochs=1, n_threads=1)
    assert rp.meta["key"] == plan_key(sparse, eng_c.cfg, 1,
                                      eng_c.num_rows)
    st, n = _train(eng_c, rp, dense, sparse, labels)
    assert n == STEPS


def test_tape_fast_forward_resume(tmp_path):
    """Mid-stream resume against a tape: skip k steps, train the rest —
    equals the uninterrupted tape run's final state when fed the same
    executed prefix (here: run 5, recreate, skip 5, run the rest)."""
    eng, dense, sparse, labels = _setup()
    tape = str(tmp_path / "tape")
    rp = plan_cache(eng, sparse, tape, epochs=1, n_threads=1)
    st_full, _ = _train(eng, rp, dense, sparse, labels)

    rp1 = plan_cache(eng, sparse, tape, epochs=1, n_threads=1)
    st = eng.init_cached_state(0)
    st, stats = eng.train_epoch_cached(st, rp1, dense, sparse, labels,
                                       steps=5)
    assert len(np.asarray(stats["loss"])) == 5
    rp1.close()
    rp2 = plan_cache(eng, sparse, tape, epochs=1, n_threads=1)
    assert rp2.fast_forward(5) == 5
    while True:
        st, stats = eng.train_epoch_cached(st, rp2, dense, sparse,
                                           labels, steps=5)
        if stats is None:
            break
    st = eng.sync_cache(st, rp2)
    np.testing.assert_array_equal(np.asarray(st_full.table),
                                  np.asarray(st.table))


def test_prestaged_dispatch_bit_exact(tmp_path):
    """stage_program_chunks + train_epoch_staged (the bench's pure-
    dispatch shape: tape + device-resident data + pre-staged programs)
    == the per-chunk train_epoch_cached path, to the last bit."""
    eng, dense, sparse, labels = _setup()
    tape = str(tmp_path / "tape")
    sp32 = sparse.astype(np.int32)

    rp = plan_cache(eng, sparse, tape, epochs=1, n_threads=1)
    dev = eng.stage_dataset(dense, sp32, labels)
    st_a = eng.init_cached_state(0)
    while True:
        st_a, stats = eng.train_epoch_cached(st_a, rp, dense, sparse,
                                             labels, steps=4,
                                             device_data=dev)
        if stats is None:
            break
    st_a = eng.sync_cache(st_a, rp)

    rp2 = plan_cache(eng, sparse, tape, epochs=1, n_threads=1)
    staged = eng.stage_program_chunks(rp2, 4)
    assert len(staged) == STEPS // 4
    st_b = eng.init_cached_state(0)
    for chunk in staged:
        st_b, stats = eng.train_epoch_staged(st_b, chunk,
                                             device_data=dev)
        assert int(np.asarray(stats["overflow"]).sum()) == 0
    st_b = eng.sync_cache(st_b, rp2)

    np.testing.assert_array_equal(np.asarray(st_a.table),
                                  np.asarray(st_b.table))
    np.testing.assert_array_equal(np.asarray(st_a.cache),
                                  np.asarray(st_b.cache))
