"""Dense-sync relaxation (config.dense_sync_every/_group): the TPU-native
rebuild of the reference's PartialReduce / bounded-sync knob
(`python/hetu/gpu_ops/PartialReduce.py`, partial-reduce client). Lockstep
SPMD has no stragglers, so what carries over is the TRADE the reference
exposes — dense-gradient sync freshness vs collective work per step:

- dense_sync_group g: per-step grad all-reduce over static subgroups of g
  dp workers (replica_groups of size g in the compiled HLO);
- dense_sync_every k: full-axis model averaging every k steps and at every
  scanned-chunk boundary (local SGD with periodic averaging).

Pinned here: exactness at the BSP corner (g=full, k=1), SGD linearity
(g=1, k=1 == BSP: averaging commutes with a linear update), genuine
divergence + convergence for k>1, the replica_groups structure of the
compiled collective, and the cached-engine leg.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from herald_tpu import HeraldConfig
from herald_tpu.data import synthetic_ctr_data
from herald_tpu.models import get_model
from herald_tpu.train.cached import CachedEngine
from herald_tpu.train.engine import Engine

ROWS = 3000
W = 8           # dp workers on the virtual mesh
B = 16

pytestmark = pytest.mark.skipif(jax.device_count() < 8,
                                reason="needs 8 virtual devices")


def _data(steps, seed=7):
    model = get_model("wdl_criteo")
    return synthetic_ctr_data(model.spec, W * B * steps, seed=seed,
                              num_rows=ROWS)


def _run_epoch(steps=8, **cfg_kw):
    base = dict(model="wdl_criteo", batch_size=B, embedding_dim=8,
                comm_mode="hybrid", learning_rate=0.5,
                a2a_capacity_factor=8.0)
    cfg = HeraldConfig(**{**base, **cfg_kw})
    eng = Engine(cfg, table_rows=ROWS)
    dense, sparse, labels = _data(steps)
    st = eng.init_state(0)
    st, stats = eng.train_epoch(st, dense, sparse, labels, steps=steps)
    assert int(np.asarray(stats["overflow"]).sum()) == 0
    return eng, st


def _dense_flat(st):
    return np.concatenate([np.asarray(v, np.float32).ravel()
                           for v in jax.tree.leaves(st.dense)])


def test_defaults_are_exact_bsp():
    cfg = HeraldConfig(model="wdl_criteo", batch_size=B, embedding_dim=8,
                       comm_mode="hybrid")
    eng = Engine(cfg, table_rows=ROWS)
    assert not eng._dsync_on


def test_config_validation():
    with pytest.raises(ValueError, match="hybrid"):
        HeraldConfig(comm_mode="local", dense_sync_every=4)
    with pytest.raises(ValueError, match="dp-only"):
        HeraldConfig(comm_mode="hybrid", mp_shards=2, dense_sync_group=1)
    with pytest.raises(ValueError, match="divide"):
        Engine(HeraldConfig(model="wdl_criteo", batch_size=B,
                            embedding_dim=8, comm_mode="hybrid",
                            dense_sync_group=3), table_rows=ROWS)


def test_full_group_every1_equals_bsp():
    """The feature-on BSP corner (g = dp axis, k = 1) reproduces the
    default path: group psum == full psum and the per-step model average
    of identical replicas is p*S/S."""
    _, st_base = _run_epoch()
    _, st_on = _run_epoch(dense_sync_every=1, dense_sync_group=W)
    # dense_sync_group=W == full axis -> _dsync_on must be False (g==dp
    # and k==1 is recognized as exact BSP and costs nothing)
    np.testing.assert_array_equal(_dense_flat(st_base), _dense_flat(st_on))


def test_sgd_local_group_every1_equals_bsp():
    """SGD linearity: purely local gradient steps (g=1) followed by a
    per-step model average (k=1) equal the BSP step exactly up to fp
    reassociation — mean_w(p - lr*g_w) == p - lr*mean_w(g_w)."""
    _, st_base = _run_epoch()
    _, st_local = _run_epoch(dense_sync_every=1, dense_sync_group=1)
    np.testing.assert_allclose(_dense_flat(st_base), _dense_flat(st_local),
                               rtol=2e-5, atol=2e-6)
    # the embedding path itself is never relaxed; the fp-reassociated
    # dense params perturb next-step logits, so tables agree to fp noise
    np.testing.assert_allclose(np.asarray(st_base.table),
                               np.asarray(st_local.table),
                               rtol=1e-4, atol=1e-6)


def test_local_sgd_every4_diverges_and_converges():
    """k>1 changes the trajectory (local steps compound at divergent
    points before the average) — and still trains: AUC beats the
    feature-off run's start and clears 0.6 on the synthetic task."""
    steps = 24
    _, st_base = _run_epoch(steps=steps)
    eng, st_k4 = _run_epoch(steps=steps, dense_sync_every=4,
                            dense_sync_group=1)
    d_base, d_k4 = _dense_flat(st_base), _dense_flat(st_k4)
    assert np.abs(d_base - d_k4).max() > 1e-6   # genuinely different math
    dense, sparse, labels = _data(steps)
    st = eng.init_state(0)
    for _ in range(3):
        st, _ = eng.train_epoch(st, dense, sparse, labels, steps=steps)
    res = eng.evaluate(st, dense, sparse, labels)
    assert res["auc"] > 0.6, res


def test_replica_groups_pin():
    """Structural pin on the compiled HLO: with dense_sync_group=2 the
    per-step dense-grad all-reduce runs over replica groups of size 2;
    the model-average / loss collectives keep the full 8-device domain."""
    import re
    cfg = HeraldConfig(model="wdl_criteo", batch_size=B, embedding_dim=8,
                       comm_mode="hybrid", dense_sync_group=2,
                       a2a_capacity_factor=8.0)
    eng = Engine(cfg, table_rows=ROWS)
    st = eng.init_state(0)
    args = eng.example_step_args()
    hlo = eng._train_step.lower(st, *args).compile().as_text()
    groups = re.findall(r"all-reduce[^\n]*replica_groups=\{(\{[^}]*\}"
                        r"(?:,\{[^}]*\})*)\}", hlo)
    sizes = {tuple(len(g.split(",")) for g in
                   re.findall(r"\{([^}]*)\}", m)) for m in groups}
    # some all-reduce ops over 8-wide groups (loss/overflow/model average)
    assert any(s == (8,) for s in sizes), sizes
    # and the subgrouped grad reduction: four groups of two
    assert any(s == (2, 2, 2, 2) for s in sizes), sizes
    # baseline compiles NO subgrouped all-reduce
    eng0 = Engine(HeraldConfig(model="wdl_criteo", batch_size=B,
                               embedding_dim=8, comm_mode="hybrid",
                               a2a_capacity_factor=8.0), table_rows=ROWS)
    st0 = eng0.init_state(0)
    hlo0 = eng0._train_step.lower(st0, *eng0.example_step_args())\
        .compile().as_text()
    groups0 = re.findall(r"all-reduce[^\n]*replica_groups=\{(\{[^}]*\}"
                         r"(?:,\{[^}]*\})*)\}", hlo0)
    sizes0 = {tuple(len(g.split(",")) for g in
                    re.findall(r"\{([^}]*)\}", m)) for m in groups0}
    assert all(s in {(8,), (1,)} or len(s) == 1 for s in sizes0), sizes0


def test_cached_engine_dsync_leg():
    """The scheduled (cached) engine honors the same knobs: the BSP corner
    matches the exact cached run bit-for-bit on the table and the k=2/g=2
    run trains with overflow 0 and a usable boundary state."""
    model = get_model("wdl_criteo")
    steps = 12
    dense, sparse, labels = synthetic_ctr_data(model.spec, W * B * steps,
                                               seed=11, num_rows=ROWS)

    def run(**kw):
        cfg = HeraldConfig(model="wdl_criteo", batch_size=B,
                           embedding_dim=8, comm_mode="hybrid",
                           learning_rate=0.5, cache_limit_ratio=0.5, **kw)
        eng = CachedEngine(cfg, table_rows=ROWS)
        pl = eng.make_planner(sparse, epochs=1, n_threads=1)
        st = eng.init_cached_state(0)
        st, stats = eng.train_epoch_cached(st, pl, dense, sparse, labels,
                                           steps=steps)
        assert int(np.asarray(stats["overflow"]).sum()) == 0
        st = eng.sync_cache(st, pl)
        pl.close()
        return eng, st

    eng_a, st_a = run()
    _, st_b = run(dense_sync_every=1, dense_sync_group=W)
    np.testing.assert_array_equal(np.asarray(st_a.table),
                                  np.asarray(st_b.table))
    np.testing.assert_array_equal(_dense_flat(st_a), _dense_flat(st_b))

    eng_c, st_c = run(dense_sync_every=2, dense_sync_group=2)
    assert np.abs(_dense_flat(st_a) - _dense_flat(st_c)).max() > 1e-7
    res = eng_c.evaluate(st_c, dense, sparse, labels)
    assert 0.0 <= res["auc"] <= 1.0


def test_dsync_adam_slots_average_and_train():
    """Nonlinear optimizer leg: with Adam the optimizer SLOTS average
    alongside the params (m/v are part of the model state in local SGD
    with periodic averaging); the run trains and the boundary state is
    usable for exact eval."""
    steps = 16
    cfg_kw = dict(optimizer="adam", learning_rate=0.05,
                  dense_sync_every=4, dense_sync_group=1)
    eng, st = _run_epoch(steps=steps, **cfg_kw)
    # slots exist and are finite after the averaged boundary
    for leaf in jax.tree.leaves(st.dense_slots):
        assert np.isfinite(np.asarray(leaf)).all()
    dense, sparse, labels = _data(steps)
    res = eng.evaluate(st, dense, sparse, labels)
    assert 0.0 <= res["auc"] <= 1.0
    # differs from the BSP adam run (staleness is real under adam too)
    _, st_bsp = _run_epoch(steps=steps, optimizer="adam",
                           learning_rate=0.05)
    assert np.abs(_dense_flat(st) - _dense_flat(st_bsp)).max() > 1e-7
