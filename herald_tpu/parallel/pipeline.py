"""GPipe-style pipeline parallelism over a 'pp' mesh axis (shard_map).

TPU-native rebuild of the reference's pipeline tier:

- `PipelineSendOp`/`PipelineReceiveOp` (NCCL p2p on a dedicated stream,
  shape handshake at infer-shape time, `gpu_ops/executor.py:741-774`,
  grouped send/recv `executor.py:1022-1045`) -> a single `lax.ppermute`
  ring shift per pipeline tick; shapes are static under jit, so there is
  no handshake, and XLA overlaps the shift with the next tick's compute.
- `SubExecutor4Gpipe` (split the per-device topo at the first
  PipelineSendOp into forward/backward halves, run all micro-batch
  forwards then all backwards, `gpu_ops/gpipe_subexecutor.py:47-58`) ->
  `lax.scan` over M + N - 1 rotating-pipeline ticks; `jax.grad` through
  the scan replays the ticks in reverse, which IS the all-forward-
  all-backward GPipe schedule, with micro-batch weight-gradient
  accumulation falling out of scan-transpose summation. No per-micro-batch
  `node_to_arr_maps` bookkeeping: XLA owns liveness.
- PipeDream/HetPipe 1F1B with weight stashing
  (`gpu_ops/pipedream_subexecutor.py:34-58,227-267`) is intentionally NOT
  rebuilt: stashing trades determinism for bubble reduction and conflicts
  with this framework's synchronous-SPMD contract (docs/deviations.md #2);
  GPipe at M >= 4N has a <= 1/5 bubble anyway.

Semantics: N pipeline stages live on the N devices of the `pp` mesh axis;
a batch is split into M micro-batches; at tick t stage s computes
micro-batch t - s (when 0 <= t - s < M) and the ring shifts activations
s -> s + 1. Total ticks T = M + N - 1; bubble fraction (N - 1) / T.

All functions run INSIDE shard_map (full-manual, check_vma=False). The
per-device loss must be seeded ONLY on the last stage (`stage_loss`) so
autodiff counts every sample exactly once; `ppermute`'s transpose is the
inverse permutation — exact. Parity with a single-device sequential tower
(values and gradients) is pinned by tests/test_pipeline.py.
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
from jax import lax


def stage_params(stacked_params, axis: str):
    """Slice MY stage's params out of a stacked pytree whose leaves carry a
    leading [num_stages] dim sharded P('pp', ...): inside shard_map each
    leaf arrives as [1, ...]; drop the stage dim."""
    del axis  # the sharding already selected the stage; kept for symmetry
    return jax.tree.map(lambda a: a[0], stacked_params)


def pipeline_apply(stage_fn: Callable[[Any, jnp.ndarray], jnp.ndarray],
                   my_params, x: jnp.ndarray, axis: str,
                   num_stages: int, num_microbatches: int) -> jnp.ndarray:
    """Run the rotating pipeline. Every pp peer receives the SAME x
    ([B, d], replicated over 'pp'); stage 0 feeds it in micro-batch by
    micro-batch. Returns [B, d] that is VALID ON THE LAST STAGE ONLY
    (other stages hold zeros/garbage) — reduce with `last_stage_value`
    or seed the loss with `stage_loss`.

    `stage_fn(params, h) -> h` must preserve the feature width (pad the
    tower to a uniform width, the standard GPipe-on-equal-stages shape).
    """
    B, d = x.shape
    M = num_microbatches
    N = num_stages
    assert B % M == 0, f"batch {B} not divisible by {M} micro-batches"
    mb = B // M
    xs = x.reshape(M, mb, d)
    i = lax.axis_index(axis)
    perm = [(s, (s + 1) % N) for s in range(N)]

    def tick(carry, t):
        state, outputs = carry
        feed = lax.dynamic_index_in_dim(xs, t % M, 0, keepdims=False)
        inp = jnp.where(i == 0, feed, state)
        out = stage_fn(my_params, inp)
        # micro-batch t - (N-1) completes at the last stage on tick t
        slot = t - (N - 1)
        cslot = jnp.clip(slot, 0, M - 1)
        cur = lax.dynamic_index_in_dim(outputs, cslot, 0, keepdims=False)
        val = jnp.where((slot >= 0) & (i == N - 1), out, cur)
        outputs = lax.dynamic_update_index_in_dim(outputs, val, cslot, 0)
        state = lax.ppermute(out, axis, perm)
        return (state, outputs), None

    state0 = jnp.zeros((mb, d), x.dtype)
    out0 = jnp.zeros((M, mb, d), x.dtype)
    (_, outputs), _ = lax.scan(tick, (state0, out0),
                               jnp.arange(M + N - 1))
    return outputs.reshape(B, d)


def last_stage_value(y: jnp.ndarray, axis: str,
                     num_stages: int) -> jnp.ndarray:
    """Replicate the last stage's pipeline output to every pp peer.
    Use OUTSIDE the loss gradient path (inference / metrics)."""
    i = lax.axis_index(axis)
    return lax.psum(jnp.where(i == num_stages - 1, y, 0), axis)


def stage_loss(loss_fn: Callable[[jnp.ndarray], jnp.ndarray],
               y: jnp.ndarray, axis: str, num_stages: int) -> jnp.ndarray:
    """Seed the training loss on the LAST stage only: returns loss_fn(y)
    there and 0.0 elsewhere, so full-manual autodiff through the
    pipeline's collectives counts each sample exactly once (the same
    disjoint-loss rule as the TP tower, train/engine.py). psum the
    returned value over 'pp' AFTER grad for reporting."""
    i = lax.axis_index(axis)
    return jnp.where(i == num_stages - 1, loss_fn(y), 0.0)
