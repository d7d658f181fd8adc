"""DeepFM towers.

Reference: `examples/ctr/models/deepfm_criteo.py`, `deepfm_avazu.py`,
`deepfm_criteosearch.py`. The reference keeps two tables over the same IDs —
1st-order [rows, 1] and 2nd-order [rows, D]. Here they are **fused into one
[rows, D+1] table** (column 0 = 1st-order weight) so one lookup / one
all-to-all exchange serves both orders; the tower slices the result. Same
math, half the sparse traffic.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from herald_tpu.data.datasets import DATASETS
from herald_tpu.models.base import ModelDef, mlp_init, normal, register
from herald_tpu.parallel import tp

_TOWERS = {
    # dataset -> (mlp widths, stddev)
    "criteo": ([256, 256, 1], 0.01),
    "avazu": ([64, 32, 1], 0.01),
    "criteosearch": ([256, 256, 1], 0.001),
}


def _make_dfm(name, spec, widths, stddev):
    F, ND = spec.num_sparse, spec.num_dense

    def init_dense(rng, emb_dim):
        k1, k2 = jax.random.split(rng)
        params = mlp_init(k1, [F * emb_dim] + widths, stddev=stddev)
        params["FM_W"] = normal(k2, (ND, 1), stddev)
        return params

    def apply(params, emb, dense):
        B = emb.shape[0]
        first = emb[:, :, 0]          # [B, F] 1st-order weights
        second = emb[:, :, 1:]        # [B, F, D] 2nd-order embeddings
        # FM first order
        y1 = (dense @ params["FM_W"]).reshape(-1) + jnp.sum(first, axis=1)
        # FM second order: 0.5 * sum((sum_f v)^2 - sum_f v^2)
        s = jnp.sum(second, axis=1)
        y2 = 0.5 * jnp.sum(s * s - jnp.sum(second * second, axis=1), axis=1)
        # DNN over flattened 2nd-order embeddings
        h = second.reshape(B, -1)
        n = len(widths)
        for i in range(n):
            h = h @ params[f"W{i + 1}"]
            if i < n - 1:
                h = jax.nn.relu(h)
        return y1 + y2 + h.reshape(-1)

    def apply_tp(params, emb, dense, axis):
        # FM terms are elementwise over the embeddings — replicated compute;
        # the DNN gets the Megatron pairing: W1 col / W2 row+psum (relu
        # after the psum, matching `apply`), W3 row+psum.
        B = emb.shape[0]
        first = emb[:, :, 0]
        second = emb[:, :, 1:]
        y1 = (dense @ params["FM_W"]).reshape(-1) + jnp.sum(first, axis=1)
        s = jnp.sum(second, axis=1)
        y2 = 0.5 * jnp.sum(s * s - jnp.sum(second * second, axis=1), axis=1)
        h = second.reshape(B, -1)
        h = jax.nn.relu(h @ params["W1"])
        h = jax.nn.relu(tp.row_parallel_sharded(h, params["W2"], axis))
        h = tp.row_parallel(h, params["W3"], axis)
        return y1 + y2 + h.reshape(-1)

    return register(ModelDef(
        name=name, spec=spec, emb_width=lambda d: d + 1,
        init_dense=init_dense, apply=apply, default_lr=0.01,
        tp_plan={"W1": "col", "W2": "row", "W3": "row"},
        apply_tp=apply_tp))


dfm_criteo = _make_dfm("dfm_criteo", DATASETS["criteo"], *_TOWERS["criteo"])
dfm_avazu = _make_dfm("dfm_avazu", DATASETS["avazu"], *_TOWERS["avazu"])
dfm_criteosearch = _make_dfm(
    "dfm_criteosearch", DATASETS["criteosearch"], *_TOWERS["criteosearch"])
