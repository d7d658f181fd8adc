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
from herald_tpu.parallel import tp

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

    def apply_tp(params, emb, dense, axis):
        # same Megatron pairing as the wdl tower (models/wdl.py), with
        # the sum-pooled embedding feeding the concat head
        pooled = jnp.sum(emb, axis=1)
        h = jax.nn.relu(dense @ params["W1"])
        h = jax.nn.relu(tp.row_parallel_sharded(h, params["W2"], axis))
        h = h @ params["W3"]
        h = tp.gather_cols(h, axis)
        y4 = jnp.concatenate([pooled, h], axis=1)
        return tp.row_parallel(y4, params["W4"], axis).reshape(-1)

    return register(ModelDef(
        name=name, spec=spec, emb_width=lambda d: d,
        init_dense=init_dense, apply=apply, default_lr=0.01,
        tp_plan={"W1": "col", "W2": "row", "W3": "col", "W4": "row"},
        apply_tp=apply_tp))


emb_sum_wdl_criteo = _make_emb_sum_wdl("emb_sum_wdl_criteo",
                                       DATASETS["criteo"])

# reference emb_sum_ncf_movie.py is structurally identical to ncf_movie
# (the name notwithstanding, it slices rather than sum-pools); register the
# alias for parity
emb_sum_ncf_movie = register(ModelDef(
    name="emb_sum_ncf_movie", spec=DATASETS["movie"],
    emb_width=lambda d: d + _NCF_LAYERS[0] // 2,
    init_dense=_ncf_init, apply=_ncf_apply, default_lr=0.01))


# ----------------------------------------------------------------------
# Wide & Deep on census-income (wdl_adult): 8 fields x 8-dim embeddings,
# deep tower 68->50->20, wide part = one-hot columns concat deep output
# into a 2-class head (`wdl_adult.py`). Binary softmax is expressed as the
# logit difference z1 - z0 (identical probabilities).
# Dense layout convention: dense[:, :4] = deep continuous features,
# dense[:, 4:] = the 809 wide columns.
# ----------------------------------------------------------------------

def _adult_init(rng, emb_dim):
    ks = jax.random.split(rng, 3)
    return {
        "W": normal(ks[0], (809 + 20, 2), 0.1),
        "W1": normal(ks[1], (8 * 8 + 4, 50), 0.1),
        "b1": normal(ks[1], (50,), 0.1),
        "W2": normal(ks[2], (50, 20), 0.1),
        "b2": normal(ks[2], (20,), 0.1),
    }


def _adult_apply(params, emb, dense):
    B = emb.shape[0]
    deep_cont = dense[:, :4]
    wide = dense[:, 4:]
    x = jnp.concatenate([emb[:, :, :8].reshape(B, -1), deep_cont], axis=1)
    h = jax.nn.relu(x @ params["W1"] + params["b1"])
    h = jax.nn.relu(h @ params["W2"] + params["b2"])
    z = jnp.concatenate([wide, h], axis=1) @ params["W"]   # [B, 2]
    return z[:, 1] - z[:, 0]


wdl_adult = register(ModelDef(
    name="wdl_adult", spec=DATASETS["adult"], emb_width=lambda d: 8,
    init_dense=_adult_init, apply=_adult_apply, default_lr=5 / 128))

