"""Model definition API.

Reference models are dataflow-graph builder functions returning
(loss, y, y_, train_op) (`examples/ctr/models/*.py`). Here a model is a pure
functional pair (init, apply) over an explicit parameter pytree, which jits
cleanly and keeps the embedding path (engine-managed, possibly sharded /
cached) separate from the dense tower — mirroring the reference split where
`embedding_lookup_op` lives on the PS path while the tower runs on-device.

The model's `apply` receives the already-looked-up embedding activations
`emb [B, F, W]` plus the dense features, and returns **logits** (pre-sigmoid);
losses use the numerically-stable fused sigmoid+BCE rather than the
reference's sigmoid->BCE pair (`wdl_criteo.py:33-37`) — same math, stable.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from herald_tpu.data.datasets import DATASETS, DatasetSpec, dataset_for_model


def normal(rng, shape, stddev=0.01, dtype=jnp.float32):
    return stddev * jax.random.normal(rng, shape, dtype)


def mlp_init(rng, sizes, stddev=0.01, bias=False, prefix="W"):
    """Init an MLP as a dict {W1..Wn[, b1..bn]} like the reference builders."""
    params = {}
    keys = jax.random.split(rng, len(sizes) - 1)
    for i, (m, n) in enumerate(zip(sizes[:-1], sizes[1:])):
        params[f"{prefix}{i + 1}"] = normal(keys[i], (m, n), stddev)
        if bias:
            params[f"b{i + 1}"] = jnp.zeros((n,), jnp.float32)
    return params


def mlp_apply(params, x, n_layers, relu_last=False, prefix="W"):
    for i in range(n_layers):
        x = x @ params[f"{prefix}{i + 1}"]
        if f"b{i + 1}" in params:
            x = x + params[f"b{i + 1}"]
        if i < n_layers - 1 or relu_last:
            x = jax.nn.relu(x)
    return x


@dataclasses.dataclass(frozen=True)
class ModelDef:
    """A CTR model: embedding-table geometry + dense tower functions."""

    name: str
    spec: DatasetSpec
    # table width given the configured embedding dim; DeepFM fuses the
    # 1st-order [rows,1] and 2nd-order [rows,D] tables of the reference
    # (deepfm_criteo.py:14-28) into one [rows, D+1] table so a single
    # all-to-all exchange serves both.
    emb_width: Callable[[int], int]
    init_dense: Callable[..., Dict]       # (rng, emb_dim) -> params
    apply: Callable[..., jnp.ndarray]     # (params, emb, dense) -> logits [B]
    default_lr: float = 0.01
    num_embed_rows: Optional[int] = None  # override spec.num_embed_rows
    # which training engine the model is meant for: "engine" (default) or
    # "fae" (hot/cold split — reference fae_* builders, run_laia_fae.py)
    train_engine: str = "engine"
    # tensor-parallel tower (cfg.mp_shards > 1): `tp_plan` maps param name
    # -> 'col' | 'row' | 'rep' (column-sharded / row-sharded / replicated
    # over the mp axis; names absent default to 'rep'), and `apply_tp` is
    # the Megatron form of `apply` taking the mp axis name:
    # (params_local, emb, dense, axis) -> logits. Built with
    # herald_tpu.parallel.tp helpers. Reference analog: per-op partition
    # states + auto-inserted Split/Sum (`python/hetu/context.py:364-596`).
    tp_plan: Optional[Dict[str, str]] = None
    apply_tp: Optional[Callable] = None

    @property
    def table_rows(self) -> int:
        return self.num_embed_rows or self.spec.num_embed_rows


_REGISTRY: Dict[str, ModelDef] = {}


def register(model: ModelDef) -> ModelDef:
    _REGISTRY[model.name] = model
    return model


def get_model(name: str) -> ModelDef:
    # late import so model modules self-register
    import herald_tpu.models  # noqa: F401
    if name not in _REGISTRY:
        raise ValueError(
            f"unknown model {name!r}; available: {sorted(_REGISTRY)}")
    return _REGISTRY[name]


def available_models():
    import herald_tpu.models  # noqa: F401
    return sorted(_REGISTRY)


def bce_with_logits(logits, labels):
    """Stable sigmoid+BCE, mean-reduced (reference binarycrossentropy_op +
    reduce_mean, `wdl_criteo.py:36-37`)."""
    logits = logits.reshape(-1)
    labels = labels.reshape(-1).astype(logits.dtype)
    # log(1+exp(-|x|)) + max(x,0) - x*y
    loss = jnp.maximum(logits, 0) - logits * labels + \
        jnp.log1p(jnp.exp(-jnp.abs(logits)))
    return jnp.mean(loss)
