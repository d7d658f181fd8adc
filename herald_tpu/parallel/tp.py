"""Megatron-style tensor-parallel layer helpers (run inside shard_map).

TPU-native rebuild of the reference's intra-layer model parallelism: where
the reference infers per-op partition states and auto-inserts
Split/Concatenate/Sum ops into the dataflow graph
(`python/hetu/context.py:364-1072`, strategies `ModelParallel4CNN` /
`OneWeirdTrick4CNN` in `python/hetu/distribute.py:154-378`), here the tower
is written directly against an `mp` mesh axis: weight matrices arrive
column- or row-sharded (the engine's PartitionSpecs do the splitting), the
helpers below insert the one collective each layer kind needs, and XLA lays
out the rest.

Sharding convention (all over the `mp` axis, dp axes untouched):
- column-parallel  W: P(None, 'mp')  — output features sharded, no comm;
  elementwise nonlinearities may be applied to the sharded output.
- row-parallel     W: P('mp', None)  — input features sharded, psum after.
- replicated       W: P()            — tiny heads / biases / cross weights.

The activations entering a TP tower are full copies within each mp group
(the engine all-gathers the embedding activations over 'mp' first), so the
math is bit-comparable to the single-device tower: relu(psum(x_shard @
W_row_shard)) == relu(x @ W) exactly, and autodiff through psum/all_gather
produces the standard Megatron gradient flow (tests/test_tp.py pins
single-device parity to 1e-5 over multiple steps).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def row_parallel(x_full, w_shard, axis):
    """Row-parallel matmul taking a FULL activation: each mp peer multiplies
    its column chunk of `x_full` by its row shard of W and psums.

    x_full: [..., K] (identical on every mp peer); w_shard: [K/mp, N].
    """
    k = w_shard.shape[0]
    i = lax.axis_index(axis)
    xs = lax.dynamic_slice_in_dim(x_full, i * k, k, axis=-1)
    return lax.psum(xs @ w_shard, axis)


def row_parallel_sharded(x_shard, w_shard, axis):
    """Row-parallel matmul taking an already column-sharded activation
    (the usual Megatron pair: follows a column-parallel layer directly).

    x_shard: [..., K/mp]; w_shard: [K/mp, N] -> full [..., N].
    """
    return lax.psum(x_shard @ w_shard, axis)


def gather_cols(x_shard, axis):
    """Materialize the full activation from a column-sharded one
    ([..., N/mp] -> [..., N]); transpose under autodiff is psum_scatter."""
    return lax.all_gather(x_shard, axis, axis=x_shard.ndim - 1, tiled=True)


def gather_batch(x_shard, axis):
    """All-gather per-device batches into the mp group's combined batch
    ([B, ...] -> [B*mp, ...]); used by the engine to feed one TP tower the
    samples of all its mp peers. Transpose is psum_scatter, which hands
    each peer exactly its own batch chunk's gradient."""
    return lax.all_gather(x_shard, axis, axis=0, tiled=True)


def my_batch_chunk(x_full, per_device, axis):
    """Slice this peer's batch chunk back out of a group-batch result."""
    i = lax.axis_index(axis)
    return lax.dynamic_slice_in_dim(x_full, i * per_device, per_device,
                                    axis=0)
