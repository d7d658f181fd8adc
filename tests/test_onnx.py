"""ONNX export/import (herald_tpu/onnx): protobuf codec round-trip, all-
model export sweep vs a pure-numpy executor, and live-engine export.

Reference analog: `python/hetu/onnx/{hetu2onnx,onnx2hetu}.py` validate by
converting a graph and re-running it; here the independent oracle is the
numpy interpreter (`onnx/runtime.py`) executing the emitted file.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from herald_tpu.models import get_model
from herald_tpu.models.base import available_models
from herald_tpu.onnx import OnnxModel, export_inference, export_state
from herald_tpu.onnx import proto


def test_proto_codec_roundtrip():
    m = {
        "ir_version": 8,
        "producer_name": "herald_tpu",
        "model_version": 1,
        "opset_import": [{"domain": "", "version": 12}],
        "graph": {
            "name": "g",
            "node": [{"input": ["x", "W"], "output": ["y"], "name": "n0",
                      "op_type": "MatMul"},
                     {"input": ["y"], "output": ["z"], "name": "n1",
                      "op_type": "ReduceSum",
                      "attribute": [{"name": "axes", "ints": [0, 1],
                                     "type": proto.ATTR_INTS},
                                    {"name": "keepdims", "i": 0,
                                     "type": proto.ATTR_INT}]}],
            "initializer": [{"name": "W", "dims": [2, 3],
                             "data_type": proto.DT_FLOAT,
                             "raw_data": np.arange(6, dtype=np.float32)
                             .tobytes()}],
            "input": [{"name": "x", "type": {"tensor_type": {
                "elem_type": proto.DT_FLOAT,
                "shape": {"dim": [{"dim_value": 4}, {"dim_value": 2}]}}}}],
            "output": [{"name": "z", "type": {"tensor_type": {
                "elem_type": proto.DT_FLOAT,
                "shape": {"dim": []}}}}],
        },
    }
    back = proto.decode("ModelProto", proto.encode("ModelProto", m))
    assert back["ir_version"] == 8
    assert back["graph"]["node"][0]["op_type"] == "MatMul"
    assert back["graph"]["node"][1]["attribute"][0]["ints"] == [0, 1]
    got = np.frombuffer(back["graph"]["initializer"][0]["raw_data"],
                        np.float32)
    np.testing.assert_array_equal(got, np.arange(6, dtype=np.float32))
    # negative varints survive (int64 twos-complement, 10-byte form)
    neg = proto.decode("AttributeProto", proto.encode(
        "AttributeProto", {"name": "i", "i": -3, "type": proto.ATTR_INT}))
    assert neg["i"] == -3


def _roundtrip(mname, rows=256, batch=8, emb_dim=8):
    model = get_model(mname)
    params = model.init_dense(jax.random.PRNGKey(0), emb_dim)
    table = 0.05 * np.random.RandomState(0).randn(
        rows, model.emb_width(emb_dim)).astype(np.float32)
    import tempfile, os
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "m.onnx")
        export_inference(model, params, table, path, batch_size=batch)
        om = OnnxModel.load(path)
    rs = np.random.RandomState(1)
    ids = rs.randint(0, rows, (batch, model.spec.num_sparse)) \
        .astype(np.int64)
    dx = rs.randn(batch, max(model.spec.num_dense, 0)).astype(np.float32)
    (probs,) = om(sparse_ids=ids, dense_x=dx)
    ref = np.asarray(jax.nn.sigmoid(model.apply(
        params, jnp.asarray(table[ids]), jnp.asarray(dx))))
    return np.abs(probs - ref).max()


def test_every_model_exports_and_matches():
    """All 21 registered towers translate through the jaxpr->ONNX path and
    the numpy executor reproduces the JAX forward to 1e-5."""
    for mname in available_models():
        err = _roundtrip(mname)
        assert err < 1e-5, (mname, err)


def test_trained_engine_export(tmp_path):
    """export_state on a trained hybrid engine: the .onnx artifact serves
    the same predictions as eng.predict (logical-row table extraction
    from the strided physical layout included)."""
    from herald_tpu import HeraldConfig
    from herald_tpu.data import synthetic_ctr_data
    from herald_tpu.train.engine import Engine

    ROWS, B = 2048, 16
    cfg = HeraldConfig(model="dfm_criteo", batch_size=B, embedding_dim=8,
                       comm_mode="hybrid", learning_rate=0.1,
                       a2a_capacity_factor=8.0)
    eng = Engine(cfg, table_rows=ROWS)
    model = get_model(cfg.model)
    dense, sparse, labels = synthetic_ctr_data(
        model.spec, 8 * B * 4, seed=3, num_rows=ROWS)
    state = eng.init_state(0)
    state, _ = eng.train_epoch(state, dense, sparse, labels)

    path = str(tmp_path / "m.onnx")
    export_state(eng, state, path, batch_size=8 * B)
    om = OnnxModel.load(path)
    (probs,) = om(sparse_ids=sparse[:8 * B].astype(np.int64),
                  dense_x=dense[:8 * B].astype(np.float32))
    ref = np.asarray(eng.predict(state, dense[:8 * B], sparse[:8 * B]))
    np.testing.assert_allclose(probs, ref.reshape(-1), rtol=1e-4,
                               atol=1e-6)
