"""Deep & Cross Network (DCN) towers.

Reference: `examples/ctr/models/dcn_criteo.py` (`cross_layer`,
`build_cross_layer` with 3 layers), plus avazu / criteosearch variants.
Input x0 = [flattened embeddings ; dense feats]; cross layers compute
x_{l+1} = x0 * (x_l w) + x_l + b.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from herald_tpu.data.datasets import DATASETS
from herald_tpu.models.base import ModelDef, mlp_init, normal, register
from herald_tpu.parallel import tp

_NUM_CROSS = 3


def _make_dcn(name, spec):
    F, ND = spec.num_sparse, spec.num_dense

    def init_dense(rng, emb_dim):
        x_dim = F * emb_dim + ND
        keys = jax.random.split(rng, 2 + _NUM_CROSS)
        params = mlp_init(keys[0], [x_dim, 256, 256, 256], stddev=0.01)
        params["W4"] = normal(keys[1], (256 + x_dim, 1), 0.01)
        for i in range(_NUM_CROSS):
            params[f"cross_w{i + 1}"] = normal(keys[2 + i], (x_dim, 1), 0.01)
            params[f"cross_b{i + 1}"] = normal(keys[2 + i], (x_dim,), 0.01)
        return params

    def apply(params, emb, dense):
        B = emb.shape[0]
        x0 = jnp.concatenate([emb.reshape(B, -1), dense], axis=1)
        x = x0
        for i in range(_NUM_CROSS):
            xw = x @ params[f"cross_w{i + 1}"]          # [B, 1]
            x = x0 * xw + x + params[f"cross_b{i + 1}"]
        h = jax.nn.relu(x0 @ params["W1"])
        h = jax.nn.relu(h @ params["W2"])
        h = h @ params["W3"]
        y4 = jnp.concatenate([x, h], axis=1)
        return (y4 @ params["W4"]).reshape(-1)

    def apply_tp(params, emb, dense, axis):
        # Cross layers stay replicated (cross_w is [x_dim, 1] — a dot per
        # layer, no useful shard). The MLP gets the Megatron pairing; the
        # head W4 stays replicated because its input width x_dim + 256 is
        # odd (x_dim = F*emb_dim + num_dense with 13 dense feats) and the
        # matrix is tiny anyway.
        B = emb.shape[0]
        x0 = jnp.concatenate([emb.reshape(B, -1), dense], axis=1)
        x = x0
        for i in range(_NUM_CROSS):
            xw = x @ params[f"cross_w{i + 1}"]
            x = x0 * xw + x + params[f"cross_b{i + 1}"]
        h = jax.nn.relu(x0 @ params["W1"])
        h = jax.nn.relu(tp.row_parallel_sharded(h, params["W2"], axis))
        h = h @ params["W3"]
        h = tp.gather_cols(h, axis)
        y4 = jnp.concatenate([x, h], axis=1)
        return (y4 @ params["W4"]).reshape(-1)

    return register(ModelDef(
        name=name, spec=spec, emb_width=lambda d: d,
        init_dense=init_dense, apply=apply, default_lr=0.003,
        tp_plan={"W1": "col", "W2": "row", "W3": "col"},
        apply_tp=apply_tp))


dcn_criteo = _make_dcn("dcn_criteo", DATASETS["criteo"])
dcn_avazu = _make_dcn("dcn_avazu", DATASETS["avazu"])
dcn_criteosearch = _make_dcn("dcn_criteosearch", DATASETS["criteosearch"])
