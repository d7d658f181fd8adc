"""Shallow sparse models: sparse LR and pure FM, plus remaining emb_sum
variants.

References: `examples/ctr/models/dfmslr_avazu.py` (sparse logistic
regression: dense linear + 1st-order embedding sum + bias),
`dfmsfm_criteosearch.py` (FM: 1st + 2nd order, no DNN),
`emb_sum_deepfm_avazu.py`, `emb_sum_dcn_criteosearch.py`,
`emb_sum_ncf_movie.py`.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from herald_tpu.data.datasets import DATASETS
from herald_tpu.models.base import ModelDef, normal, register


def _make_slr(name, spec, stddev=0.01):
    """Sparse LR: logits = dense @ W + sum(E1[ids]) + bias.
    Table width 1 (first-order weights only)."""
    ND = spec.num_dense

    def init_dense(rng, emb_dim):
        return {"FM_W": normal(rng, (ND, 1), stddev),
                "bias": jnp.full((1,), 0.01, jnp.float32)}

    def apply(params, emb, dense):
        first = emb[:, :, 0]
        return ((dense @ params["FM_W"]).reshape(-1)
                + jnp.sum(first, axis=1) + params["bias"][0])

    return register(ModelDef(
        name=name, spec=spec, emb_width=lambda d: 1,
        init_dense=init_dense, apply=apply, default_lr=0.001))


def _make_sfm(name, spec, stddev=0.01):
    """Pure FM: 1st + 2nd order, fused [rows, D+1] table like DeepFM."""
    ND = spec.num_dense

    def init_dense(rng, emb_dim):
        return {"FM_W": normal(rng, (ND, 1), stddev),
                "bias": jnp.full((1,), 0.01, jnp.float32)}

    def apply(params, emb, dense):
        first = emb[:, :, 0]
        second = emb[:, :, 1:]
        y1 = (dense @ params["FM_W"]).reshape(-1) + jnp.sum(first, axis=1)
        s = jnp.sum(second, axis=1)
        y2 = 0.5 * jnp.sum(s * s - jnp.sum(second * second, axis=1), axis=1)
        return y1 + y2 + params["bias"][0]

    return register(ModelDef(
        name=name, spec=spec, emb_width=lambda d: d + 1,
        init_dense=init_dense, apply=apply, default_lr=0.001))


dfmslr_avazu = _make_slr("dfmslr_avazu", DATASETS["avazu"])
dfmsfm_criteosearch = _make_sfm("dfmsfm_criteosearch",
                                DATASETS["criteosearch"])


# ----------------------------------------------------------------------
# remaining emb_sum variants: sum-pool embeddings before the tower
# ----------------------------------------------------------------------

def _make_emb_sum_dfm(name, spec, widths, stddev=0.01):
    """Sum-pooled DeepFM (`emb_sum_deepfm_avazu.py`): FM orders as usual,
    DNN over the sum-pooled 2nd-order embedding instead of the flattened
    [F*D] tensor."""
    ND = spec.num_dense

    def init_dense(rng, emb_dim):
        from herald_tpu.models.base import mlp_init
        k1, k2 = jax.random.split(rng)
        params = mlp_init(k1, [emb_dim] + widths, stddev=stddev)
        params["FM_W"] = normal(k2, (ND, 1), stddev)
        return params

    def apply(params, emb, dense):
        first = emb[:, :, 0]
        second = emb[:, :, 1:]
        y1 = (dense @ params["FM_W"]).reshape(-1) + jnp.sum(first, axis=1)
        s = jnp.sum(second, axis=1)
        y2 = 0.5 * jnp.sum(s * s - jnp.sum(second * second, axis=1), axis=1)
        h = s  # sum-pooled
        n = len(widths)
        for i in range(n):
            h = h @ params[f"W{i + 1}"]
            if i < n - 1:
                h = jax.nn.relu(h)
        return y1 + y2 + h.reshape(-1)

    return register(ModelDef(
        name=name, spec=spec, emb_width=lambda d: d + 1,
        init_dense=init_dense, apply=apply, default_lr=0.01))


def _make_emb_sum_dcn(name, spec):
    """Sum-pooled DCN (`emb_sum_dcn_criteosearch.py`)."""
    from herald_tpu.models.base import mlp_init
    ND = spec.num_dense
    NUM_CROSS = 3

    def init_dense(rng, emb_dim):
        x_dim = emb_dim + ND
        keys = jax.random.split(rng, 2 + NUM_CROSS)
        params = mlp_init(keys[0], [x_dim, 256, 256, 256], stddev=0.01)
        params["W4"] = normal(keys[1], (256 + x_dim, 1), 0.01)
        for i in range(NUM_CROSS):
            params[f"cross_w{i + 1}"] = normal(keys[2 + i], (x_dim, 1), 0.01)
            params[f"cross_b{i + 1}"] = normal(keys[2 + i], (x_dim,), 0.01)
        return params

    def apply(params, emb, dense):
        pooled = jnp.sum(emb, axis=1)
        x0 = jnp.concatenate([pooled, dense], axis=1)
        x = x0
        for i in range(NUM_CROSS):
            xw = x @ params[f"cross_w{i + 1}"]
            x = x0 * xw + x + params[f"cross_b{i + 1}"]
        h = jax.nn.relu(x0 @ params["W1"])
        h = jax.nn.relu(h @ params["W2"])
        h = h @ params["W3"]
        y4 = jnp.concatenate([x, h], axis=1)
        return (y4 @ params["W4"]).reshape(-1)

    return register(ModelDef(
        name=name, spec=spec, emb_width=lambda d: d,
        init_dense=init_dense, apply=apply, default_lr=0.003))


emb_sum_dfm_avazu = _make_emb_sum_dfm("emb_sum_dfm_avazu",
                                      DATASETS["avazu"], [64, 32, 1])
emb_sum_dcn_criteosearch = _make_emb_sum_dcn("emb_sum_dcn_criteosearch",
                                             DATASETS["criteosearch"])
