"""NCF, Deep-Crossing, and sum-pooled (emb_sum) model variants.

References: `examples/ctr/models/ncf_movie.py`, `dc_criteo.py`,
`emb_sum_wdl_criteo.py`, `emb_sum_deepfm_avazu.py`, `emb_sum_ncf_movie.py`,
`emb_sum_dcn_criteosearch.py`.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from herald_tpu.data.datasets import DATASETS
from herald_tpu.models.base import ModelDef, mlp_init, normal, register

# ----------------------------------------------------------------------
# NCF (MovieLens): GMF + MLP towers over user/item embeddings.
# Reference ncf_movie.py: table width = embed_dim + layers[0]//2, first
# embed_dim columns feed the matrix-factorization path, the rest the MLP.
# ----------------------------------------------------------------------
_NCF_LAYERS = [64, 32, 16, 8]


def _ncf_init(rng, emb_dim):
    ks = jax.random.split(rng, 4)
    L = _NCF_LAYERS
    return {
        "W1": normal(ks[0], (L[0], L[1]), 0.1),
        "W2": normal(ks[1], (L[1], L[2]), 0.1),
        "W3": normal(ks[2], (L[2], L[3]), 0.1),
        "W4": normal(ks[3], (emb_dim + L[3], 1), 0.1),
    }


def _ncf_apply(params, emb, dense):
    # emb: [B, 2, emb_dim + L0//2]; field 0 = user, field 1 = item
    emb_dim = emb.shape[-1] - _NCF_LAYERS[0] // 2
    user, item = emb[:, 0, :], emb[:, 1, :]
    mf = user[:, :emb_dim] * item[:, :emb_dim]
    mlp_in = jnp.concatenate([user[:, emb_dim:], item[:, emb_dim:]], axis=1)
    h = jax.nn.relu(mlp_in @ params["W1"])
    h = jax.nn.relu(h @ params["W2"])
    h = jax.nn.relu(h @ params["W3"])
    y = jnp.concatenate([mf, h], axis=1) @ params["W4"]
    return y.reshape(-1)


ncf_movie = register(ModelDef(
    name="ncf_movie", spec=DATASETS["movie"],
    emb_width=lambda d: d + _NCF_LAYERS[0] // 2,
    init_dense=_ncf_init, apply=_ncf_apply, default_lr=0.01))


# ----------------------------------------------------------------------
# Deep Crossing (dc_criteo): 5 residual units over [emb ; dense].
# ----------------------------------------------------------------------
_DC_LAYERS = 5


def _dc_init(rng, emb_dim):
    spec = DATASETS["criteo"]
    x_dim = spec.num_sparse * emb_dim + spec.num_dense
    keys = jax.random.split(rng, 2 * _DC_LAYERS + 1)
    params = {}
    for i in range(_DC_LAYERS):
        params[f"res_w1_{i}"] = normal(keys[2 * i], (x_dim, x_dim), 0.1)
        params[f"res_b1_{i}"] = normal(keys[2 * i], (x_dim,), 0.1)
        params[f"res_w2_{i}"] = normal(keys[2 * i + 1], (x_dim, x_dim), 0.1)
        params[f"res_b2_{i}"] = normal(keys[2 * i + 1], (x_dim,), 0.1)
    params["W4"] = normal(keys[-1], (x_dim, 1), 0.1)
    return params


def _dc_apply(params, emb, dense):
    B = emb.shape[0]
    x = jnp.concatenate([emb.reshape(B, -1), dense], axis=1)
    for i in range(_DC_LAYERS):
        h = jax.nn.relu(x @ params[f"res_w1_{i}"] + params[f"res_b1_{i}"])
        h = h @ params[f"res_w2_{i}"] + params[f"res_b2_{i}"]
        x = jax.nn.relu(h + x)
    return (x @ params["W4"]).reshape(-1)


dc_criteo = register(ModelDef(
    name="dc_criteo", spec=DATASETS["criteo"], emb_width=lambda d: d,
    init_dense=_dc_init, apply=_dc_apply, default_lr=0.001))


# ----------------------------------------------------------------------
# emb_sum variants: embeddings sum-pooled over fields before the tower,
# shrinking the dense input (reference emb_sum_wdl_criteo.py:16).
# ----------------------------------------------------------------------

def _make_emb_sum_wdl(name, spec):
    ND = spec.num_dense

    def init_dense(rng, emb_dim):
        k1, k2 = jax.random.split(rng)
        params = mlp_init(k1, [ND, 256, 256, 256], stddev=0.01)
        params["W4"] = normal(k2, (256 + emb_dim, 1), 0.01)
        return params

    def apply(params, emb, dense):
        pooled = jnp.sum(emb, axis=1)           # [B, D]
        h = jax.nn.relu(dense @ params["W1"])
        h = jax.nn.relu(h @ params["W2"])
        h = h @ params["W3"]
        y4 = jnp.concatenate([pooled, h], axis=1)
        return (y4 @ params["W4"]).reshape(-1)

    return register(ModelDef(
        name=name, spec=spec, emb_width=lambda d: d,
        init_dense=init_dense, apply=apply, default_lr=0.01))


emb_sum_wdl_criteo = _make_emb_sum_wdl("emb_sum_wdl_criteo",
                                       DATASETS["criteo"])
