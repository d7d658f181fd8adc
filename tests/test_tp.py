"""Tensor-parallel dense tower (cfg.mp_shards > 1): Megatron column/row
sharding over the 'mp' mesh axis must match single-device training exactly.

TPU-native rebuild of the reference's intra-layer model parallelism
(`python/hetu/context.py:364-1072` partition-state inference,
`python/hetu/distribute.py:154-378` ModelParallel4CNN / OneWeirdTrick4CNN:
DP feature path + MP fully-connected layers). The reference validates its MP
strategies by comparing against the single-worker graph; the oracle here is
likewise our own local mode.
"""

import numpy as np
import pytest

import jax
from jax.sharding import NamedSharding, PartitionSpec as P

from herald_tpu import HeraldConfig
from herald_tpu.data import synthetic_ctr_data
from herald_tpu.models import get_model
from herald_tpu.train.engine import Engine

ROWS = 4096
B = 16          # per-device batch in hybrid mode (8 devices)
STEPS = 4


def _tp_pair(mname, mp, optimizer="sgd", lr=0.1):
    cfg_l = HeraldConfig(model=mname, batch_size=8 * B, embedding_dim=8,
                         comm_mode="local", optimizer=optimizer,
                         learning_rate=lr)
    cfg_tp = HeraldConfig(model=mname, batch_size=B, embedding_dim=8,
                          comm_mode="hybrid", optimizer=optimizer,
                          learning_rate=lr, a2a_capacity_factor=8.0,
                          mp_shards=mp)
    e_local = Engine(cfg_l, table_rows=ROWS)
    e_tp = Engine(cfg_tp, table_rows=ROWS)
    assert e_tp.num_shards == 8 and e_tp.dp_shards == 8 // mp
    s_local = e_local.init_state(0)
    s_tp = e_tp.init_state(0)
    # start from the same LOGICAL table (strided layout permutes rows)
    tphys = e_tp.exchange.to_physical(np.asarray(s_local.table))
    s_tp = s_tp._replace(table=jax.device_put(
        tphys, NamedSharding(e_tp.mesh, P(("dp", "mp"), None))))
    return e_local, e_tp, s_local, s_tp


def _assert_state_parity(e_local, e_tp, s_local, s_tp):
    np.testing.assert_allclose(
        np.asarray(s_local.table)[:ROWS],
        e_tp.exchange.to_logical(np.asarray(s_tp.table)),
        rtol=1e-4, atol=1e-6)
    for k in s_local.dense:
        np.testing.assert_allclose(
            np.asarray(s_local.dense[k]), np.asarray(s_tp.dense[k]),
            rtol=1e-4, atol=1e-6, err_msg=k)


@pytest.mark.parametrize("mname,mp", [
    ("wdl_criteo", 2),   # col/row/col/row plan incl. concat head
    ("wdl_criteo", 4),
    ("dfm_criteo", 2),   # replicated FM path + sharded DNN
    ("dcn_criteo", 2),   # replicated cross layers + sharded MLP
    ("emb_sum_wdl_criteo", 2),   # sum-pooled embeddings + sharded tower
])
def test_tp_matches_local(mname, mp):
    model = get_model(mname)
    dense, sparse, labels = synthetic_ctr_data(
        model.spec, 8 * B * STEPS, seed=3, num_rows=ROWS)
    e_local, e_tp, s_local, s_tp = _tp_pair(mname, mp)

    for t in range(STEPS):
        sl = slice(t * 8 * B, (t + 1) * 8 * B)
        s_local, st_l = e_local.train_step(
            s_local, dense[sl], sparse[sl], labels[sl])
        s_tp, st_t = e_tp.train_step(
            s_tp, dense[sl], sparse[sl], labels[sl])
        assert int(st_t["overflow"]) == 0
        np.testing.assert_allclose(float(st_l["loss"]),
                                   float(st_t["loss"]), rtol=1e-5)
    _assert_state_parity(e_local, e_tp, s_local, s_tp)

    # eval path: group logits sliced back to per-device chunks
    ev_l = e_local.evaluate(s_local, dense, sparse, labels)
    ev_t = e_tp.evaluate(s_tp, dense, sparse, labels)
    assert abs(ev_l["auc"] - ev_t["auc"]) < 1e-6


def test_tp_scanned_epoch_matches_local():
    """The scanned executor (train_epoch) under TP: same math as
    step-at-a-time, mirroring the plain engine's scan coverage."""
    mname = "wdl_criteo"
    model = get_model(mname)
    dense, sparse, labels = synthetic_ctr_data(
        model.spec, 8 * B * STEPS, seed=5, num_rows=ROWS)
    e_local, e_tp, s_local, s_tp = _tp_pair(mname, 2)

    s_local, st_l = e_local.train_epoch(s_local, dense, sparse, labels)
    s_tp, st_t = e_tp.train_epoch(s_tp, dense, sparse, labels)
    assert int(np.asarray(st_t["overflow"]).sum()) == 0
    np.testing.assert_allclose(np.asarray(st_l["loss"]),
                               np.asarray(st_t["loss"]), rtol=1e-5)
    _assert_state_parity(e_local, e_tp, s_local, s_tp)


def test_tp_adam_slots_follow_param_sharding():
    """Elementwise dense optimizers keep exactness with mp-sharded slots."""
    mname = "dfm_criteo"
    model = get_model(mname)
    dense, sparse, labels = synthetic_ctr_data(
        model.spec, 8 * B * STEPS, seed=7, num_rows=ROWS)
    e_local, e_tp, s_local, s_tp = _tp_pair(mname, 2, optimizer="adam",
                                            lr=0.01)
    for t in range(STEPS):
        sl = slice(t * 8 * B, (t + 1) * 8 * B)
        s_local, _ = e_local.train_step(
            s_local, dense[sl], sparse[sl], labels[sl])
        s_tp, st_t = e_tp.train_step(
            s_tp, dense[sl], sparse[sl], labels[sl])
        assert int(st_t["overflow"]) == 0
    _assert_state_parity(e_local, e_tp, s_local, s_tp)


def test_tp_config_validation():
    with pytest.raises(ValueError, match="comm_mode"):
        HeraldConfig(model="wdl_criteo", mp_shards=2)
    with pytest.raises(ValueError, match="dp-only"):
        HeraldConfig(model="wdl_criteo", comm_mode="hybrid", mp_shards=2,
                     use_cache=True)
    with pytest.raises(ValueError, match="lamb"):
        HeraldConfig(model="wdl_criteo", comm_mode="hybrid", mp_shards=2,
                     optimizer="lamb")
    # models without a TP tower are rejected with the supported list
    cfg = HeraldConfig(model="dc_criteo", comm_mode="hybrid", mp_shards=2)
    with pytest.raises(ValueError, match="no tensor-parallel tower"):
        Engine(cfg, table_rows=ROWS)
    # mesh not divisible
    cfg = HeraldConfig(model="wdl_criteo", comm_mode="hybrid", mp_shards=3)
    with pytest.raises(ValueError, match="divisible"):
        Engine(cfg, table_rows=ROWS)


def test_tp_checkpoint_roundtrip_and_cross_topology(tmp_path):
    """TP states checkpoint like any other: mp-sharded dense params save as
    generic shard blocks; restore works into the same mesh AND across
    topologies (mp=2 -> 1-D dp=8 and back), since the GLOBAL param values
    are topology-independent."""
    from herald_tpu.train.checkpoint import load_checkpoint, save_checkpoint
    mname = "wdl_criteo"
    model = get_model(mname)
    dense, sparse, labels = synthetic_ctr_data(
        model.spec, 8 * B * 2, seed=9, num_rows=ROWS)
    _, e_tp, _, s_tp = _tp_pair(mname, 2)
    s_tp, _ = e_tp.train_step(s_tp, dense[:8 * B], sparse[:8 * B],
                              labels[:8 * B])
    save_checkpoint(s_tp, str(tmp_path))

    # same-mesh round trip: bit-exact
    s_back = load_checkpoint(str(tmp_path), e_tp.init_state(1))
    for k in s_tp.dense:
        np.testing.assert_array_equal(np.asarray(s_tp.dense[k]),
                                      np.asarray(s_back.dense[k]))
    np.testing.assert_array_equal(np.asarray(s_tp.table),
                                  np.asarray(s_back.table))

    # cross-topology: restore into the 1-D dp=8 hybrid engine (same flat
    # shard count, so the table layout is unchanged; dense params
    # reassemble from blocks into replicated placement)
    cfg_dp = HeraldConfig(model=mname, batch_size=B, embedding_dim=8,
                          comm_mode="hybrid", learning_rate=0.1,
                          a2a_capacity_factor=8.0)
    e_dp = Engine(cfg_dp, table_rows=ROWS)
    s_dp = load_checkpoint(str(tmp_path), e_dp.init_state(2))
    for k in s_tp.dense:
        np.testing.assert_array_equal(np.asarray(s_tp.dense[k]),
                                      np.asarray(s_dp.dense[k]))
    np.testing.assert_array_equal(np.asarray(s_tp.table),
                                  np.asarray(s_dp.table))

    # and the reverse direction (dp-saved -> TP engine)
    s_dp, _ = e_dp.train_step(s_dp, dense[8 * B:], sparse[8 * B:],
                              labels[8 * B:])
    save_checkpoint(s_dp, str(tmp_path / "dp"))
    s_tp2 = load_checkpoint(str(tmp_path / "dp"), e_tp.init_state(3))
    for k in s_dp.dense:
        np.testing.assert_array_equal(np.asarray(s_dp.dense[k]),
                                      np.asarray(s_tp2.dense[k]))
    # training continues identically from either restore
    s_dp2, st_a = e_dp.train_step(s_dp, dense[:8 * B], sparse[:8 * B],
                                  labels[:8 * B])
    s_tp3, st_b = e_tp.train_step(s_tp2, dense[:8 * B], sparse[:8 * B],
                                  labels[:8 * B])
    np.testing.assert_allclose(float(st_a["loss"]), float(st_b["loss"]),
                               rtol=1e-6)


def test_tp_state_onnx_export(tmp_path):
    """export_state gathers mp-sharded dense params into global arrays;
    the artifact's predictions match the TP engine's."""
    from herald_tpu.onnx import OnnxModel, export_state
    mname = "wdl_criteo"
    model = get_model(mname)
    dense, sparse, labels = synthetic_ctr_data(
        model.spec, 8 * B, seed=11, num_rows=ROWS)
    _, e_tp, _, s_tp = _tp_pair(mname, 2)
    s_tp, _ = e_tp.train_step(s_tp, dense, sparse, labels)
    path = str(tmp_path / "tp.onnx")
    export_state(e_tp, s_tp, path, batch_size=8 * B)
    om = OnnxModel.load(path)
    (probs,) = om(sparse_ids=sparse.astype(np.int64),
                  dense_x=dense.astype(np.float32))
    ref = np.asarray(e_tp.predict(s_tp, dense, sparse)).reshape(-1)
    np.testing.assert_allclose(probs, ref, rtol=1e-4, atol=1e-6)


def test_tp_exchange_bytes_match_1d_mesh():
    """TP must not inflate embedding-exchange traffic: the compiled HLO
    all-to-all bytes of the (4, 2) TP step equal the 1-D 8-device step's
    (same S=8 flat sharding, same capacities). Collective-bytes accounting
    from utils/hlo_stats, the same instrument as benchmarks/mesh_ab.py."""
    from herald_tpu.utils.hlo_stats import collective_bytes
    cfg_dp = HeraldConfig(model="wdl_criteo", batch_size=B, embedding_dim=8,
                          comm_mode="hybrid", a2a_capacity_factor=4.0)
    cfg_tp = HeraldConfig(model="wdl_criteo", batch_size=B, embedding_dim=8,
                          comm_mode="hybrid", a2a_capacity_factor=4.0,
                          mp_shards=2)
    e_dp = Engine(cfg_dp, table_rows=ROWS)
    e_tp = Engine(cfg_tp, table_rows=ROWS)
    assert e_tp.exchange.capacity == e_dp.exchange.capacity
    st_dp = e_dp.init_state(0)
    st_tp = e_tp.init_state(0)
    b_dp = collective_bytes(e_dp._train_step, st_dp,
                            *e_dp.example_step_args())
    b_tp = collective_bytes(e_tp._train_step, st_tp,
                            *e_tp.example_step_args())
    assert b_tp["all-to-all"] == b_dp["all-to-all"], (b_tp, b_dp)


def test_tp_apply_matches_apply_forward():
    """apply_tp under shard_map == apply, per TP-capable model (forward)."""
    from jax.sharding import Mesh
    devices = np.array(jax.devices()).reshape(4, 2)
    mesh = Mesh(devices, ("dp", "mp"))
    for mname in ("wdl_criteo", "dfm_criteo", "dcn_criteo",
                  "emb_sum_wdl_criteo"):
        model = get_model(mname)
        params = model.init_dense(jax.random.PRNGKey(0), 8)
        Bf = 32
        W = model.emb_width(8)
        emb = 0.1 * jax.random.normal(
            jax.random.PRNGKey(1), (Bf, model.spec.num_sparse, W))
        dense = jax.random.normal(
            jax.random.PRNGKey(2), (Bf, max(model.spec.num_dense, 0)))
        ref = model.apply(params, emb, dense)

        kindmap = {"col": P(None, "mp"), "row": P("mp", None), "rep": P()}
        specs = {k: kindmap[(model.tp_plan or {}).get(k, "rep")]
                 for k in params}
        out = jax.jit(jax.shard_map(
            lambda p, e, d: model.apply_tp(p, e, d, "mp"),
            mesh=mesh, check_vma=False,
            in_specs=(specs, P(), P()), out_specs=P()))(params, emb, dense)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-5, atol=1e-7, err_msg=mname)
