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
- `SubExecutor4Pipedream` (1F1B generator schedule + `copy_latest_weight`
  stashing + per-micro-batch local apply,
  `gpu_ops/pipedream_subexecutor.py:34-58,227-267`) -> `pipedream_apply`:
  the SAME weight-stashing semantics, rebuilt deterministically as a
  `lax.scan` over 2(M+N-1) slots. The key observation making it SPMD:
  the canonical 1F1B timetable has the closed form F(s,m) = s + 2m,
  B(s,m) = 2N-1-s + 2m, which puts forwards and backwards of a stage on
  OPPOSITE slot parities (never colliding), satisfies every dependency
  with exactly one-slot ppermute latency, and bounds in-flight
  micro-batches at stage s to PipeDream's N-s — so the stash is a
  static [N]-deep ring buffer in the scan carry, and "asynchrony"
  reduces to deterministic weight staleness (forward of micro-batch m
  at stage s uses weights that include updates from micro-batches
  <= m-(N-s), exactly the reference's stash discipline). Backward
  recomputes the stage forward from the stashed input + stashed weight
  version (`jax.vjp` rematerialization) instead of keeping per-batch
  `node_to_arr_maps`.

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


def pipedream_apply(stage_fn: Callable[[Any, jnp.ndarray], jnp.ndarray],
                    loss_fn: Callable[[jnp.ndarray, jnp.ndarray],
                                      jnp.ndarray],
                    my_params, x: jnp.ndarray, targets: jnp.ndarray,
                    axis: str, num_stages: int, num_microbatches: int,
                    update_fn: Callable[[Any, Any], Any],
                    dp_axis: str = None, dp_sync_every: int = 1):
    """PipeDream 1F1B with weight stashing over a micro-batch stream.

    The reference trains CONTINUOUSLY (no pipeline flush between
    batches), applying each micro-batch's gradient at a stage as soon as
    its backward completes there, and stashing the weight version each
    forward used so its backward differentiates the same weights
    (`gpu_ops/pipedream_subexecutor.py:227-267`). This function runs that
    schedule for a stream of M micro-batches (a stream may span what the
    caller considers several batches) and drains, returning the final
    per-stage weights plus the M per-micro-batch losses.

    Semantics per slot t (see module docstring for the timetable):
      forward  of mb f = (t-s)/2        when parity matches and 0<=f<M,
               using CURRENT weights, stashing (input, weights) at f%N;
      backward of mb b = (t-(2N-1-s))/2 when parity matches and 0<=b<M,
               rematerializing from stash slot b%N, seeding dL/dy locally
               on the last stage, then params <- update_fn(params, gw).

    `update_fn(params, grads) -> params` owns lr/optimizer; under a dp
    axis it should psum grads over 'dp' so stage replicas stay in
    lockstep. Inactive slots still trace both compute paths (masked
    selects) — the standard SPMD cost of a data-dependent schedule; on
    an 8-way CPU test mesh this is noise, and real towers are 3-layer
    MLPs.

    **HetPipe/WSP mode** (`dp_axis`, `dp_sync_every=k`): the reference's
    third pipeline flavor keeps weights on the parameter server — each
    pipeline replica (HetPipe's "virtual worker") applies micro-batch
    updates locally and re-syncs through the PS with bounded staleness
    (`gpu_ops/pipedream_subexecutor.py:155-162` grad_accum_map,
    `executor.py:192,401` hetpipe wiring; the WSP idea). SPMD form: pass
    a LOCAL update_fn (no dp psum) and `dp_axis` — each stage's params
    are then averaged over its dp replica group after every k-th
    micro-batch update and once at drain, so the stream boundary is
    exactly replicated. The cond predicate is uniform across a stage's
    dp group (the 1F1B timetable is identical for all replicas of a
    stage), and k=1 with SGD equals the lockstep psum composition
    exactly (linearity; pinned by tests/test_pipeline.py).

    Returns (new_my_params, losses[M] valid on the last stage — psum
    over 'pp' outside to read them everywhere).
    """
    B, d = x.shape
    M, N = num_microbatches, num_stages
    assert B % M == 0, f"stream {B} not divisible by {M} micro-batches"
    mb = B // M
    xs = x.reshape(M, mb, d)
    tgts = targets.reshape(M, mb, *targets.shape[1:])
    s = lax.axis_index(axis)
    is_first = s == 0
    is_last = s == N - 1
    fwd_perm = [(i, (i + 1) % N) for i in range(N)]
    bwd_perm = [(i, (i - 1) % N) for i in range(N)]

    def bslot0(b):
        return jnp.clip(b, 0, M - 1)

    if dp_axis is not None:
        dp_size = lax.psum(1, dp_axis)   # static: constant-folds to size

        def _dp_avg(ps):
            return jax.tree.map(
                lambda v: (lax.psum(v, dp_axis) / dp_size).astype(v.dtype),
                ps)

    def tick(carry, t):
        params, stash_w, stash_x, fwd_state, bwd_state, losses = carry

        # ---- forward half: F(s, f) at t = s + 2f ----
        rel_f = t - s
        f = jnp.clip(rel_f, 0, None) // 2
        do_f = (rel_f >= 0) & (rel_f % 2 == 0) & (f < M)
        feed = lax.dynamic_index_in_dim(xs, jnp.clip(f, 0, M - 1), 0,
                                        keepdims=False)
        x_in = jnp.where(is_first, feed, fwd_state)
        out = stage_fn(params, x_in)
        fslot = f % N
        stash_x = lax.dynamic_update_index_in_dim(
            stash_x,
            jnp.where(do_f, x_in,
                      lax.dynamic_index_in_dim(stash_x, fslot, 0,
                                               keepdims=False)),
            fslot, 0)
        stash_w = jax.tree.map(
            lambda st, p: lax.dynamic_update_index_in_dim(
                st,
                jnp.where(do_f, p,
                          lax.dynamic_index_in_dim(st, fslot, 0,
                                                   keepdims=False)),
                fslot, 0),
            stash_w, params)

        # ---- backward half: B(s, b) at t = 2N-1-s + 2b ----
        rel_b = t - (2 * N - 1 - s)
        b = jnp.clip(rel_b, 0, None) // 2
        do_b = (rel_b >= 0) & (rel_b % 2 == 0) & (b < M)
        bslot = b % N
        w_b = jax.tree.map(
            lambda st: lax.dynamic_index_in_dim(st, bslot, 0,
                                                keepdims=False), stash_w)
        x_b = lax.dynamic_index_in_dim(stash_x, bslot, 0, keepdims=False)
        tgt_b = lax.dynamic_index_in_dim(tgts, jnp.clip(b, 0, M - 1), 0,
                                         keepdims=False)
        y, vjp = jax.vjp(stage_fn, w_b, x_b)
        loss_b, dLdy = jax.value_and_grad(loss_fn)(y, tgt_b)
        g_seed = jnp.where(is_last, dLdy, bwd_state)
        gw, gx = vjp(g_seed)
        params = jax.tree.map(
            lambda p, q: jnp.where(do_b, q, p),
            params, update_fn(params, gw))
        if dp_axis is not None:
            # WSP re-sync: average this stage's params over its dp
            # replica group after every k-th completed update (uniform
            # predicate across the group — same stage, same timetable)
            sync_due = do_b & ((b + 1) % dp_sync_every == 0)
            params = lax.cond(sync_due, _dp_avg, lambda ps: ps, params)
        losses = lax.dynamic_update_index_in_dim(
            losses,
            jnp.where(do_b & is_last, loss_b,
                      lax.dynamic_index_in_dim(losses, bslot0(b), 0,
                                               keepdims=False)),
            bslot0(b), 0)

        fwd_state = lax.ppermute(out, axis, fwd_perm)
        bwd_state = lax.ppermute(gx, axis, bwd_perm)
        return (params, stash_w, stash_x, fwd_state, bwd_state,
                losses), None

    stash_w0 = jax.tree.map(
        lambda p: jnp.zeros((N,) + p.shape, p.dtype), my_params)
    stash_x0 = jnp.zeros((N, mb, d), x.dtype)
    st0 = jnp.zeros((mb, d), x.dtype)
    losses0 = jnp.zeros((M,), jnp.float32)
    carry0 = (my_params, stash_w0, stash_x0, st0, st0, losses0)
    (params, _, _, _, _, losses), _ = lax.scan(
        tick, carry0, jnp.arange(2 * (M + N - 1)))
    if dp_axis is not None:
        params = _dp_avg(params)    # drained stream ends exactly synced
    return params, losses


def hetpipe_apply(stage_fn, loss_fn, my_params, x, targets, axis: str,
                  dp_axis: str, num_stages: int, num_microbatches: int,
                  update_fn, sync_every: int = 1):
    """HetPipe (WSP) pipeline: PipeDream 1F1B per pipeline replica +
    bounded-staleness weight sync across the dp replica group — the
    reference's third `config.pipeline` flavor, where weights live on
    the parameter server and each pipeline syncs through it
    (`gpu_ops/executor.py:192,401`, `pipedream_subexecutor.py:155-162`).
    `update_fn` must be LOCAL (no dp psum); every `sync_every`
    micro-batch updates each stage's params average over `dp_axis`
    (and once at drain). See pipedream_apply for the schedule."""
    return pipedream_apply(stage_fn, loss_fn, my_params, x, targets,
                           axis, num_stages, num_microbatches, update_fn,
                           dp_axis=dp_axis, dp_sync_every=sync_every)


def stage_loss(loss_fn: Callable[[jnp.ndarray], jnp.ndarray],
               y: jnp.ndarray, axis: str, num_stages: int) -> jnp.ndarray:
    """Seed the training loss on the LAST stage only: returns loss_fn(y)
    there and 0.0 elsewhere, so full-manual autodiff through the
    pipeline's collectives counts each sample exactly once (the same
    disjoint-loss rule as the TP tower, train/engine.py). psum the
    returned value over 'pp' AFTER grad for reporting."""
    i = lax.axis_index(axis)
    return jnp.where(i == num_stages - 1, loss_fn(y), 0.0)
