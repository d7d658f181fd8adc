"""Wide & Deep (WDL) towers.

Reference: `examples/ctr/models/wdl_criteo.py`, `wdl_avazu.py`:
3-layer 256-wide MLP over the dense features, concatenated with the flattened
embeddings, then a single linear head.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from herald_tpu.data.datasets import DATASETS
from herald_tpu.models.base import ModelDef, mlp_init, normal, register
from herald_tpu.parallel import tp


def _make_wdl(name, spec):
    F, ND = spec.num_sparse, spec.num_dense

    def init_dense(rng, emb_dim):
        k1, k2 = jax.random.split(rng)
        params = mlp_init(k1, [ND, 256, 256, 256], stddev=0.01)
        params["W4"] = normal(k2, (256 + F * emb_dim, 1), 0.01)
        return params

    def apply(params, emb, dense):
        B = emb.shape[0]
        sparse_flat = emb.reshape(B, -1)
        h = jax.nn.relu(dense @ params["W1"])
        h = jax.nn.relu(h @ params["W2"])
        h = h @ params["W3"]
        y4 = jnp.concatenate([sparse_flat, h], axis=1)
        return (y4 @ params["W4"]).reshape(-1)

    def apply_tp(params, emb, dense, axis):
        # Megatron pairing of the same tower: W1 col / W2 row+psum (relu
        # sits after the psum, matching `apply` exactly), W3 col, gather
        # the tiny [B, 256] hidden, W4 row+psum over the concat input.
        B = emb.shape[0]
        sparse_flat = emb.reshape(B, -1)
        h = jax.nn.relu(dense @ params["W1"])
        h = jax.nn.relu(tp.row_parallel_sharded(h, params["W2"], axis))
        h = h @ params["W3"]
        h = tp.gather_cols(h, axis)
        y4 = jnp.concatenate([sparse_flat, h], axis=1)
        return tp.row_parallel(y4, params["W4"], axis).reshape(-1)

    return register(ModelDef(
        name=name, spec=spec, emb_width=lambda d: d,
        init_dense=init_dense, apply=apply, default_lr=0.01,
        tp_plan={"W1": "col", "W2": "row", "W3": "col", "W4": "row"},
        apply_tp=apply_tp))


wdl_criteo = _make_wdl("wdl_criteo", DATASETS["criteo"])
wdl_avazu = _make_wdl("wdl_avazu", DATASETS["avazu"])
