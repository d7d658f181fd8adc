"""Checkpoint round-trip + LR schedule tests."""

import numpy as np
import pytest

from herald_tpu import HeraldConfig
from herald_tpu.data import synthetic_ctr_data
from herald_tpu.models import get_model
from herald_tpu.optim.schedules import (ReduceOnPlateau, get_schedule)
from herald_tpu.train.checkpoint import load_checkpoint, save_checkpoint
from herald_tpu.train.engine import Engine

ROWS = 1000
B = 32


def test_checkpoint_roundtrip(tmp_path):
    cfg = HeraldConfig(model="wdl_criteo", batch_size=B, embedding_dim=8,
                       comm_mode="local", optimizer="adam",
                       learning_rate=0.01)
    model = get_model(cfg.model)
    eng = Engine(cfg, table_rows=ROWS)
    dense, sparse, labels = synthetic_ctr_data(model.spec, B * 4, seed=10,
                                               num_rows=ROWS)
    state = eng.init_state(0)
    for t in range(4):
        sl = slice(t * B, (t + 1) * B)
        state, _ = eng.train_step(state, dense[sl], sparse[sl], labels[sl])

    save_checkpoint(state, str(tmp_path / "ckpt"))
    restored = load_checkpoint(str(tmp_path / "ckpt"), eng.init_state(1))
    np.testing.assert_array_equal(np.asarray(state.table),
                                  np.asarray(restored.table))
    assert int(restored.step) == 4
    for k in state.dense:
        np.testing.assert_array_equal(np.asarray(state.dense[k]),
                                      np.asarray(restored.dense[k]))
    # optimizer slots restored too (reference did not checkpoint these)
    np.testing.assert_array_equal(np.asarray(state.table_slots["m"]),
                                  np.asarray(restored.table_slots["m"]))

    # training continues identically from the restored state
    sl = slice(0, B)
    s1, st1 = eng.train_step(state, dense[sl], sparse[sl], labels[sl])
    s2, st2 = eng.train_step(restored, dense[sl], sparse[sl], labels[sl])
    np.testing.assert_allclose(float(st1["loss"]), float(st2["loss"]),
                               rtol=1e-6)


def test_checkpoint_hybrid_resharding(tmp_path):
    cfg = HeraldConfig(model="wdl_criteo", batch_size=8, embedding_dim=8,
                       comm_mode="hybrid")
    eng = Engine(cfg, table_rows=ROWS)
    state = eng.init_state(0)
    save_checkpoint(state, str(tmp_path / "ckpt"))
    restored = load_checkpoint(str(tmp_path / "ckpt"), eng.init_state(1))
    np.testing.assert_array_equal(np.asarray(state.table),
                                  np.asarray(restored.table))
    assert restored.table.sharding == state.table.sharding


def test_lr_schedules():
    import jax.numpy as jnp
    f = get_schedule("step", 1.0, step_size=10, gamma=0.5)
    assert float(f(jnp.asarray(1))) == 1.0
    assert float(f(jnp.asarray(11))) == 0.5
    assert float(f(jnp.asarray(21))) == 0.25
    f = get_schedule("exp", 1.0, gamma=0.9)
    np.testing.assert_allclose(float(f(jnp.asarray(3))), 0.81, rtol=1e-6)
    f = get_schedule("multistep", 1.0, milestones=[5, 8])
    assert float(f(jnp.asarray(5))) == 1.0
    np.testing.assert_allclose(float(f(jnp.asarray(6))), 0.1, rtol=1e-5)
    np.testing.assert_allclose(float(f(jnp.asarray(9))), 0.01, rtol=1e-5)
    f = get_schedule("cosine", 1.0, total_steps=11)
    np.testing.assert_allclose(float(f(jnp.asarray(6))), 0.5, atol=1e-6)
    with pytest.raises(ValueError):
        get_schedule("nope", 1.0)


def test_reduce_on_plateau():
    s = ReduceOnPlateau(1.0, patience=2, factor=0.1)
    for v in [1.0, 0.9, 0.8]:
        assert s.step(v) == 1.0       # improving
    assert s.step(0.85) == 1.0        # bad 1
    assert s.step(0.85) == 1.0        # bad 2
    assert abs(s.step(0.85) - 0.1) < 1e-12   # bad 3 > patience -> decay


def test_lr_schedule_in_engine():
    cfg = HeraldConfig(model="wdl_criteo", batch_size=B, embedding_dim=8,
                       comm_mode="local", learning_rate=1.0,
                       lr_schedule="step",
                       lr_schedule_kwargs={"step_size": 2, "gamma": 0.0})
    model = get_model(cfg.model)
    eng = Engine(cfg, table_rows=ROWS)
    dense, sparse, labels = synthetic_ctr_data(model.spec, B * 4, seed=11,
                                               num_rows=ROWS)
    state = eng.init_state(0)
    s1, _ = eng.train_step(state, dense[:B], sparse[:B], labels[:B])
    t_after_1 = np.asarray(s1.table).copy()   # donated by the next step
    # steps 3+ have lr 0 -> table must stop changing
    s2, _ = eng.train_step(s1, dense[B:2 * B], sparse[B:2 * B],
                           labels[B:2 * B])
    t2 = np.asarray(s2.table).copy()
    s3, _ = eng.train_step(s2, dense[2 * B:3 * B], sparse[2 * B:3 * B],
                           labels[2 * B:3 * B])
    t3 = np.asarray(s3.table)
    assert np.abs(t_after_1 - t2).max() > 1e-4      # step 2 still lr=1
    # step 3 lr is clamped at ending=1e-8 (reference StepScheduler
    # semantics), so the table is near-frozen but not bit-identical
    assert np.abs(t2 - t3).max() < 1e-6


def test_checkpoint_roundtrip_pinned_state(tmp_path):
    """CachedTrainState including the pinned hot tier survives save/load."""
    import jax
    from herald_tpu.train.cached import CachedEngine
    from herald_tpu.train.checkpoint import load_checkpoint, save_checkpoint
    from herald_tpu.data import synthetic_ctr_data
    from herald_tpu.models import get_model

    cfg = HeraldConfig(model="wdl_criteo", batch_size=8, embedding_dim=8,
                       comm_mode="local", cache_limit_ratio=0.5,
                       pinned_rows=32, learning_rate=0.5)
    eng = CachedEngine(cfg, table_rows=1000)
    model = get_model(cfg.model)
    dense, sparse, labels = synthetic_ctr_data(model.spec, 8 * 6, seed=0,
                                               num_rows=1000)
    state = eng.init_cached_state(0)
    pl = eng.make_planner(sparse, epochs=1, n_threads=1)
    for _ in range(3):
        state, stats = eng.train_step_cached(state, pl, dense, sparse,
                                             labels)
        assert stats is not None
    save_checkpoint(state, str(tmp_path / "ck"))
    restored = load_checkpoint(str(tmp_path / "ck"), state)
    for a, b in zip(jax.tree.leaves(state), jax.tree.leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    pl.close()


def test_checkpoint_cross_topology_resize():
    """Pod resize: a TrainState saved under one shard count restores onto
    another — the strided table layout remaps automatically (elastic
    scale up/down; reference has no analog: PS shard counts were fixed
    per job)."""
    import jax
    import tempfile
    if jax.device_count() < 8:
        pytest.skip("needs 8 virtual devices")
    model = get_model("wdl_criteo")
    rows = 1000
    dense, sparse, labels = synthetic_ctr_data(model.spec, 8 * 8 * 4,
                                               seed=12, num_rows=rows)

    cfg8 = HeraldConfig(model="wdl_criteo", batch_size=8, embedding_dim=8,
                        comm_mode="hybrid", learning_rate=0.5,
                        a2a_capacity_factor=8.0)
    e8 = Engine(cfg8, table_rows=rows)
    s8 = e8.init_state(0)
    for t in range(4):
        sl = slice(t * 64, (t + 1) * 64)
        s8, _ = e8.train_step(s8, dense[sl], sparse[sl], labels[sl])
    logical8 = e8.exchange.to_logical(np.asarray(s8.table))

    with tempfile.TemporaryDirectory() as d:
        save_checkpoint(s8, d)

        # scale DOWN to one device
        cfg1 = HeraldConfig(model="wdl_criteo", batch_size=64,
                            embedding_dim=8, comm_mode="local",
                            learning_rate=0.5)
        e1 = Engine(cfg1, table_rows=rows)
        s1 = load_checkpoint(d, e1.init_state(3))
        np.testing.assert_array_equal(np.asarray(s1.table)[:rows],
                                      logical8)
        assert int(s1.step) == 4

        # and back UP: save from one device, restore onto eight (save
        # BEFORE the continuation step donates s1's buffers)
        with tempfile.TemporaryDirectory() as d2:
            save_checkpoint(s1, d2)
            # training continues on the resized topology
            s1b, st = e1.train_step(s1, dense[:64], sparse[:64],
                                    labels[:64])
            assert np.isfinite(float(st["loss"]))
            s8b = load_checkpoint(d2, e8.init_state(5))
            np.testing.assert_array_equal(
                e8.exchange.to_logical(np.asarray(s8b.table)), logical8)
