"""Pallas TPU kernels for the embedding hot path.

Hand-written counterparts of the reference CUDA kernels, for cases where
explicit DMA scheduling is wanted:

- `embedding_gather`   <- `src/ops/EmbeddingLookup.cu:3-24` (gather)
- `rows_scatter_add`   <- `src/ops/EmbeddingLookup.cu:26-61` (atomic-add
                          gradient) / `src/ops/IndexedSlices.cu`
- `fm_second_order`    <- the DeepFM FM interaction
                          (`examples/ctr/models/deepfm_criteo.py:29-37`)

TPU reality check (full measured cost model: docs/PERF_NOTES.md): Mosaic
tiles HBM memrefs in (8, 128)-element groups, so the smallest addressable
DMA unit spanning an embedding row of width 128 is the 8-row tile *group*
containing it, and per-row DMA issue costs ~100 ns/descriptor — XLA's
native gather/scatter engine (~23/~72 ns per index) wins at CTR shapes,
so `herald_tpu.train.Engine` keeps the XLA path by default. The one-hot
MXU kernels below sidestep random access entirely and are the substrate
for replicated hot-tier math; the DMA kernels remain as correctness-tested
substrates for fused variants (e.g. gather+pool, gather+FM).

All kernels fall back to `interpret=True` off-TPU so the same tests run on
the CPU mesh.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_GROUP = 8   # sublane tile height: minimal row-aligned DMA unit


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False


# ----------------------------------------------------------------------
# gather
# ----------------------------------------------------------------------

def _make_gather_kernel(block_rows, D):
    def kernel(ids_ref, table_ref, out_ref, scratch, sems):
        i = pl.program_id(0)

        def dma(j):
            row = ids_ref[i * block_rows + j]
            group = (row // _GROUP) * _GROUP
            return pltpu.make_async_copy(
                table_ref.at[pl.ds(group, _GROUP), :],
                scratch.at[j], sems.at[j])

        for j in range(block_rows):          # all group DMAs in flight
            dma(j).start()
        for j in range(block_rows):
            dma(j).wait()
        for j in range(block_rows):
            row = ids_ref[i * block_rows + j]
            # dynamic sublane indices are not lowerable; select the row
            # from the tile group with a mask instead
            sel = jax.lax.broadcasted_iota(
                jnp.int32, (_GROUP, 1), 0) == (row % _GROUP)
            grp = scratch[j]
            out_ref[j, :] = jnp.sum(
                jnp.where(sel, grp, jnp.zeros_like(grp)), axis=0)
    return kernel


@functools.partial(jax.jit, static_argnames=("block_rows", "interpret"))
def embedding_gather(table: jnp.ndarray, ids: jnp.ndarray,
                     block_rows: int = 16,
                     interpret: bool | None = None) -> jnp.ndarray:
    """table [R, D] (R a multiple of 8), ids [N] -> [N, D].

    Each grid step issues `block_rows` aligned (8, D) group DMAs (all in
    flight) and selects the target rows in VMEM.
    """
    if interpret is None:
        interpret = not _on_tpu()
    N = ids.shape[0]
    R, D = table.shape
    assert R % _GROUP == 0, "pad the table to a multiple of 8 rows"
    if N % block_rows:
        pad = block_rows - N % block_rows
        ids = jnp.concatenate([ids, jnp.zeros(pad, ids.dtype)])
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(ids.shape[0] // block_rows,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((block_rows, D),
                               lambda i, ids_ref: (i, 0)),
        scratch_shapes=[
            pltpu.VMEM((block_rows, _GROUP, D), table.dtype),
            pltpu.SemaphoreType.DMA((block_rows,)),
        ],
    )
    out = pl.pallas_call(
        _make_gather_kernel(block_rows, D),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((ids.shape[0], D), table.dtype),
        interpret=interpret,
    )(ids.astype(jnp.int32), table)
    return out[:N]


# ----------------------------------------------------------------------
# scatter-add (in-place row update)
# ----------------------------------------------------------------------

def _make_scatter_kernel(block_rows, D):
    def kernel(n_ref, ids_ref, grads_ref, table_in_ref, out_ref, scratch,
               sem):
        i = pl.program_id(0)
        n = n_ref[0]

        # strictly sequential read-modify-write per row: two ids may share
        # an (8, D) tile group, so group write-back must complete before
        # the next group read (also why padded lanes are skipped)
        for j in range(block_rows):
            @pl.when(i * block_rows + j < n)
            def _(j=j):
                row = ids_ref[i * block_rows + j]
                group = (row // _GROUP) * _GROUP
                rd = pltpu.make_async_copy(
                    out_ref.at[pl.ds(group, _GROUP), :], scratch, sem)
                rd.start()
                rd.wait()
                sel = jax.lax.broadcasted_iota(
                    jnp.int32, (_GROUP, 1), 0) == (row % _GROUP)
                scratch[:] = jnp.where(
                    sel,
                    scratch[:] + grads_ref[j, :].astype(scratch.dtype),
                    scratch[:])
                wr = pltpu.make_async_copy(
                    scratch, out_ref.at[pl.ds(group, _GROUP), :], sem)
                wr.start()
                wr.wait()
    return kernel


@functools.partial(jax.jit, static_argnames=("block_rows", "interpret"),
                   donate_argnums=(0,))
def rows_scatter_add(table: jnp.ndarray, ids: jnp.ndarray,
                     grads: jnp.ndarray, block_rows: int = 16,
                     interpret: bool | None = None) -> jnp.ndarray:
    """table [R, D] (donated), unique ids [N], grads [N, D] -> scatter-add.

    IDs MUST be unique (pre-combine duplicates with a segment-sum, as the
    engine's dedup path and the reference's `deduplicate_kernel`,
    `src/ops/OptimizersSparse.cu:53-106`, both do). Row updates are
    sequential group read-modify-writes; only touched groups move through
    VMEM.
    """
    if interpret is None:
        interpret = not _on_tpu()
    N, D = grads.shape
    R = table.shape[0]
    assert R % _GROUP == 0, "pad the table to a multiple of 8 rows"
    if N % block_rows:
        pad = block_rows - N % block_rows
        ids = jnp.concatenate([ids, jnp.zeros(pad, ids.dtype)])
        grads = jnp.concatenate([grads, jnp.zeros((pad, D), grads.dtype)])
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(ids.shape[0] // block_rows,),
        in_specs=[
            pl.BlockSpec((block_rows, D), lambda i, n_ref, ids_ref: (i, 0)),
            pl.BlockSpec(memory_space=pl.ANY),    # table (aliased)
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((_GROUP, D), table.dtype),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    return pl.pallas_call(
        _make_scatter_kernel(block_rows, D),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(table.shape, table.dtype),
        input_output_aliases={3: 0},   # table operand -> output buffer
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(jnp.asarray([N], jnp.int32), ids.astype(jnp.int32), grads, table)


# ----------------------------------------------------------------------
# fused one-hot embedding ops (MXU path, no random HBM access)
# ----------------------------------------------------------------------
# Gather/segment-reduce expressed as `onehot(ids) @ table` with the one-hot
# generated in-register per tile (never materialized to HBM). Exact: the
# one-hot is 0/1 in bf16 and accumulation is f32. Cost is O(N*H) VPU
# generation (~135 us at N=6656, H=4096 on v5e), flat in duplication.
# docs/PERF_NOTES.md has the measured tradeoffs: on ONE chip these do not
# beat XLA's per-index gather/scatter at CTR shapes; their role is the
# replicated hot-row block in multi-chip training, where they convert
# all-to-all exchange traffic into local MXU work (reference analog: the
# FAE hot-embedding dense matrix, examples/ctr/models/fae_wdl_criteo.py).


def _onehot_gather_kernel(H, TM):
    def kernel(ids_ref, table_ref, out_ref):
        ids = ids_ref[0, :]
        oh = (jax.lax.broadcasted_iota(jnp.int32, (TM, H), 1)
              == ids[:, None]).astype(jnp.bfloat16)
        out_ref[:] = jax.lax.dot_general(
            oh, table_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(out_ref.dtype)
    return kernel


@functools.partial(jax.jit, static_argnames=("block_ids", "interpret"))
def hot_onehot_gather(hot_table: jnp.ndarray, ids: jnp.ndarray,
                      block_ids: int = 512,
                      interpret: bool | None = None) -> jnp.ndarray:
    """hot_table [H, D], ids [N] -> [N, D]; ids outside [0, H) yield zero
    rows (cold ids pass through untouched by construction)."""
    if interpret is None:
        interpret = not _on_tpu()
    H, D = hot_table.shape
    N = ids.shape[0]
    TM = min(block_ids, N)
    n = N
    if n % TM:
        pad = TM - n % TM
        ids = jnp.concatenate([ids, jnp.full(pad, -1, ids.dtype)])
        n += pad
    out = pl.pallas_call(
        _onehot_gather_kernel(H, TM),
        grid=(n // TM,),
        in_specs=[pl.BlockSpec((1, TM), lambda i: (0, i)),
                  pl.BlockSpec((H, D), lambda i: (0, 0))],
        out_specs=pl.BlockSpec((TM, D), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((n, D), hot_table.dtype),
        interpret=interpret,
    )(ids.astype(jnp.int32).reshape(1, n), hot_table)
    return out[:N]


def _onehot_push_kernel(TH):
    def kernel(ids_ref, grads_ref, out_ref):
        i = pl.program_id(0)
        n = ids_ref.shape[1]
        ids = ids_ref[0, :]
        oh = (jax.lax.broadcasted_iota(jnp.int32, (TH, n), 0) + i * TH
              == ids[None, :]).astype(jnp.bfloat16)
        out_ref[:] = jax.lax.dot_general(
            oh, grads_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
    return kernel


@functools.partial(jax.jit,
                   static_argnames=("num_rows", "block_rows", "interpret"))
def hot_onehot_push(ids: jnp.ndarray, grads: jnp.ndarray, num_rows: int,
                    block_rows: int = 512,
                    interpret: bool | None = None) -> jnp.ndarray:
    """ids [N], grads [N, D] -> delta [num_rows, D] f32 segment-sum
    (duplicates accumulate; ids outside [0, num_rows) are dropped).

    The MXU replacement for `jax.ops.segment_sum` / scatter-add when the
    segment space is small (a hot block, a cache, an all-to-all bucket)."""
    if interpret is None:
        interpret = not _on_tpu()
    N, D = grads.shape
    TH = min(block_rows, num_rows)
    assert num_rows % TH == 0, (num_rows, TH)
    return pl.pallas_call(
        _onehot_push_kernel(TH),
        grid=(num_rows // TH,),
        in_specs=[pl.BlockSpec((1, N), lambda i: (0, 0)),
                  pl.BlockSpec((N, D), lambda i: (0, 0))],
        out_specs=pl.BlockSpec((TH, D), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((num_rows, D), jnp.float32),
        interpret=interpret,
    )(ids.astype(jnp.int32).reshape(1, N), grads)


# ----------------------------------------------------------------------
# FM second-order interaction
# ----------------------------------------------------------------------

def _fm_kernel(emb_ref, out_ref):
    emb = emb_ref[:].astype(jnp.float32)          # [BB, F, D]
    s = jnp.sum(emb, axis=1)                      # [BB, D]
    sq = jnp.sum(emb * emb, axis=1)               # [BB, D]
    out_ref[:] = 0.5 * jnp.sum(s * s - sq, axis=1, keepdims=True)


@functools.partial(jax.jit, static_argnames=("block_b", "interpret"))
def fm_second_order(emb: jnp.ndarray, block_b: int = 128,
                    interpret: bool | None = None) -> jnp.ndarray:
    """emb [B, F, D] -> [B] FM 2nd-order term 0.5*((sum_f v)^2 - sum_f v^2).

    One VPU pass per batch block; replaces three XLA reductions + two
    elementwise ops with a single fused kernel.
    """
    if interpret is None:
        interpret = not _on_tpu()
    B, F, D = emb.shape
    block_b = min(block_b, B)
    assert B % block_b == 0, (B, block_b)
    out = pl.pallas_call(
        _fm_kernel,
        grid=(B // block_b,),
        in_specs=[pl.BlockSpec((block_b, F, D), lambda i: (i, 0, 0))],
        out_specs=pl.BlockSpec((block_b, 1), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((B, 1), jnp.float32),
        interpret=interpret,
    )(emb)
    return out.reshape(B)
