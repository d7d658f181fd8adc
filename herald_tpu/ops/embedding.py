"""Embedding lookup / sparse-gradient primitives.

TPU-native replacements for the reference CUDA kernels
`src/ops/EmbeddingLookup.cu` (gather + atomic-add grad) and
`src/ops/IndexedSlices.cu` (dedup + sparse-to-dense scatter): here gathers
compile to XLA dynamic-gather feeding the MXU tower, duplicate-ID reduction
is `segment_sum`, and dedup is `jnp.unique` with a **static size** so the
whole step stays jittable (XLA requires static shapes; the reference dedups
with np.unique on host, `python/hetu/ndarray.py:503-543`).
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp


def embedding_lookup(table: jnp.ndarray, ids: jnp.ndarray) -> jnp.ndarray:
    """Gather rows: table [R, D], ids [...]-> [..., D]."""
    return jnp.take(table, ids, axis=0)


@partial(jax.jit, static_argnames=("size",))
def dedup_ids(ids: jnp.ndarray, size: int) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Static-shape dedup.

    Returns (unique_ids [size], inverse [ids.size], num_unique []).
    Padding slots hold the largest id present (jnp.unique fill behavior),
    and `num_unique` tells how many slots are real.
    """
    flat = ids.reshape(-1)
    uniq, inv = jnp.unique(flat, size=size, return_inverse=True,
                           fill_value=None)
    num = jnp.sum(jnp.concatenate([jnp.ones((1,), jnp.int32),
                                   (uniq[1:] != uniq[:-1]).astype(jnp.int32)]))
    return uniq, inv.reshape(-1), num


def segment_sum_grads(grad: jnp.ndarray, inverse: jnp.ndarray,
                      num_segments: int) -> jnp.ndarray:
    """Reduce duplicate-ID gradients: grad [N, D] by inverse [N] -> [U, D].

    Equivalent to the reference's `deduplicate_kernel` +
    `indexedslices2dense` scatter-add (`src/ops/OptimizersSparse.cu:53-106`).
    """
    flat = grad.reshape(-1, grad.shape[-1])
    return jax.ops.segment_sum(flat, inverse, num_segments=num_segments)


def scatter_add_rows(table: jnp.ndarray, rows: jnp.ndarray,
                     values: jnp.ndarray) -> jnp.ndarray:
    """table [R, D] += values [U, D] at rows [U] (duplicate rows allowed)."""
    return table.at[rows].add(values)
