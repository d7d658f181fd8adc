"""Row-sharded embedding exchange over a device mesh.

This module is the TPU-native replacement for the reference's entire
parameter-server data path:

- table partitioning across servers (`ps-lite/include/ps/partitioner.h:31-123`
  AveragePartitioner) -> **strided** row ownership over mesh shards:
  logical row r lives on shard r % S at local slot r // S (the reference's
  BlockPartitioner with block size 1). Strided beats contiguous ranges on
  skewed CTR streams: hot IDs spread evenly over owners, so per-(src,dst)
  all-to-all buckets stay balanced (measured ~1.4x smaller maxima on Zipf
  streams) and the static capacities shrink with them. The physical
  jax.Array is still block-sharded; physical slot of logical row r is
  (r % S) * rows_per_shard + r // S (`ExchangeSpec.phys_index`);
- worker-side request splitting / offset rebasing / response scatter
  (`ps-lite/include/ps/worker/PSAgent.h:124-183,537-629`) -> static-shape
  bucketing by owner + `jax.lax.all_to_all` inside `shard_map`;
- sparse push of gradients (`kPushEmbedding`,
  `ps-lite/src/PSFhandle_embedding.cc:5-28`) -> the transposed all-to-all
  followed by a local segment-sum and row-wise optimizer update.

Everything is static-shape: each (source, destination) pair gets a fixed
`capacity` of ID slots per step. IDs beyond capacity are dropped and counted
(`overflow`); size capacity via `HeraldConfig.a2a_capacity_factor`.

All functions here run **inside shard_map** (one program per mesh shard).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


@dataclasses.dataclass(frozen=True)
class ExchangeSpec:
    axis: str            # mesh axis name the table rows are sharded over
    num_shards: int
    rows_per_shard: int  # padded so num_shards * rows_per_shard >= num_rows
    num_rows: int        # valid (un-padded) table height
    capacity: int        # ID slots per (src, dst) shard pair per step

    @property
    def padded_rows(self) -> int:
        return self.num_shards * self.rows_per_shard

    # ---- strided ownership maps (logical row id <-> physical position) ---
    def owner_of(self, ids):
        """Shard owning logical row id (numpy or jnp)."""
        return ids % self.num_shards

    def local_of(self, ids):
        """Owner-local slot of logical row id."""
        return ids // self.num_shards

    def phys_index(self, ids):
        """Position of logical row id in the (block-sharded) global array."""
        return (ids % self.num_shards) * self.rows_per_shard \
            + ids // self.num_shards

    def logical_index(self, phys):
        """Inverse of phys_index (may exceed num_rows on padding slots)."""
        return (phys % self.rows_per_shard) * self.num_shards \
            + phys // self.rows_per_shard

    def to_physical(self, table_logical):
        """Build the padded physical array from a logical [num_rows, ...]
        host array (padding slots zero). Test/checkpoint helper."""
        import numpy as np
        logical = self.logical_index(np.arange(self.padded_rows))
        ok = logical < len(table_logical)
        out = np.zeros((self.padded_rows,) + table_logical.shape[1:],
                       table_logical.dtype)
        out[ok] = table_logical[logical[ok]]
        return out

    def to_logical(self, table_physical):
        """Recover the logical [num_rows, ...] view from the physical
        array (host helper)."""
        import numpy as np
        phys = self.phys_index(np.arange(self.num_rows))
        return np.asarray(table_physical)[phys]


def make_exchange(num_rows: int, num_shards: int, ids_per_step: int,
                  axis: str = "dp", capacity_factor: float = 2.0,
                  capacity: Optional[int] = None) -> ExchangeSpec:
    rows_per_shard = -(-num_rows // num_shards)
    rows_per_shard = -(-rows_per_shard // 8) * 8   # sublane-tile aligned
                                                   # (Pallas row-group DMA)
    if capacity is None:
        if num_shards == 1:
            capacity = ids_per_step
        else:
            capacity = int(-(-ids_per_step // num_shards) * capacity_factor)
            capacity = min(max(capacity, 8), ids_per_step)
    return ExchangeSpec(axis=axis, num_shards=num_shards,
                        rows_per_shard=rows_per_shard, num_rows=num_rows,
                        capacity=capacity)


class Route(NamedTuple):
    """Host-independent routing of one step's unique IDs.

    NOTE on sentinels: jnp `.at[].get/set` with mode='fill'/'drop' still
    *wraps* negative indices, so dropped entries use the positive
    out-of-bounds sentinel S*C (buffer size), never -1.
    """
    pos: jnp.ndarray        # [U] slot of each unique id in the send buffer,
                            #     S*C (out of bounds) if dropped
    recv_ids: jnp.ndarray   # [S, C] ids requested from *me* by each shard,
                            #     -1 for empty slots (value, never an index)
    overflow: jnp.ndarray   # [] number of dropped (real) ids this step


def _all_to_all(spec: ExchangeSpec, x: jnp.ndarray) -> jnp.ndarray:
    """Exchange leading-axis blocks between shards ([S, ...] per device)."""
    if spec.num_shards == 1:
        return x
    return lax.all_to_all(x, spec.axis, split_axis=0, concat_axis=0,
                          tiled=False)


def route_ids(spec: ExchangeSpec, uniq_ids: jnp.ndarray,
              valid: jnp.ndarray) -> Route:
    """Bucket this shard's unique IDs by owner shard and exchange them.

    uniq_ids: [U] int32/int64 global row ids (deduped), `valid` marks real
    entries (dedup padding is invalid).
    """
    S, C = spec.num_shards, spec.capacity
    U = uniq_ids.shape[0]
    owner = jnp.where(valid, uniq_ids % S, S)
    order = jnp.argsort(owner, stable=True)
    sorted_owner = owner[order]
    # index of each element within its owner group
    group_start = jnp.searchsorted(sorted_owner, sorted_owner, side="left")
    idx_in_group = jnp.arange(U) - group_start
    ok = (sorted_owner < S) & (idx_in_group < C)
    slot = jnp.where(ok, sorted_owner * C + idx_in_group, S * C)

    send_ids = jnp.full((S * C,), -1, dtype=uniq_ids.dtype)
    send_ids = send_ids.at[slot].set(uniq_ids[order], mode="drop")

    # pos[p] = send-buffer slot of unique p (original order); S*C if dropped
    pos = jnp.full((U,), S * C, dtype=jnp.int32)
    pos = pos.at[order].set(slot.astype(jnp.int32))

    overflow = jnp.sum((sorted_owner < S) & ~ok)
    recv_ids = _all_to_all(spec, send_ids.reshape(S, C))
    return Route(pos=pos, recv_ids=recv_ids, overflow=overflow)


def gather_rows(spec: ExchangeSpec, table_shard: jnp.ndarray,
                route: Route) -> jnp.ndarray:
    """Serve lookups: each shard gathers its owned rows for every requester
    and all-to-alls the vectors back. Returns [U, D] vectors aligned with
    the routed unique IDs (zeros for dropped slots)."""
    S, C = spec.num_shards, spec.capacity
    local = route.recv_ids // jnp.asarray(S, route.recv_ids.dtype)
    local = jnp.where(route.recv_ids >= 0, local,
                      spec.rows_per_shard)  # positive OOB sentinel
    flat = local.reshape(-1)
    vecs = table_shard.at[flat].get(mode="fill", fill_value=0)
    back = _all_to_all(spec, vecs.reshape(S, C, -1))
    flat_back = back.reshape(S * C, -1)
    out = flat_back.at[route.pos].get(mode="fill", fill_value=0)
    return out


def rowquant_int8(x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-row symmetric int8 quantization: scale = maxabs/127 (zero rows
    get scale 1 so dequant is well-defined). Returns (q [.., D] int8,
    scale [..] f32); dequant = q * scale. Used by both the wire encoder
    (`scatter_grads` with wire_dtype=int8) and the caller-side error-
    feedback residual (train/cached.py) — SAME function so the residual
    is exact: x == q*scale + residual bit-for-bit in f32."""
    m = jnp.max(jnp.abs(x), axis=-1)
    scale = jnp.where(m > 0, m / 127.0, 1.0).astype(jnp.float32)
    q = jnp.clip(jnp.round(x / scale[..., None].astype(x.dtype)),
                 -127, 127).astype(jnp.int8)
    return q, scale


def scatter_grads(
    spec: ExchangeSpec,
    route: Route,
    grad_uniq: jnp.ndarray,     # [U, D] summed grads per unique id
    counts_uniq: Optional[jnp.ndarray] = None,  # [U] dup counts per id
    wire_dtype=None,            # e.g. jnp.bfloat16: compress grads on the
                                # wire; accumulation stays in grad dtype
) -> Tuple[jnp.ndarray, jnp.ndarray, Optional[jnp.ndarray], jnp.ndarray]:
    """Reverse path: send grads to owner shards, dedup and sum locally.

    Returns (local_rows [S*C], row_grads [S*C, D], row_counts [S*C] or
    None, row_mask [S*C]) on the owner shard: unique local row indices with
    their summed gradients; masked entries are padding. Per-row update
    counts (the reference ApplyCache scaling, `server/optimizer.h`) cost an
    extra all_to_all, so they are exchanged only when `counts_uniq` is
    given; callers that don't scale by counts get None back for free.
    """
    S, C = spec.num_shards, spec.capacity
    D = grad_uniq.shape[-1]
    if wire_dtype is not None and np.dtype(wire_dtype) == np.int8:
        # int8 wire: 1 byte/element payload + one f32 scale per row
        # (D+4 bytes vs 2D bf16 / 4D f32). The sender keeps the exact
        # residual grad_uniq - q*scale (recompute via rowquant_int8) for
        # error feedback; see train/cached.py _flush_phase.
        q, scale = rowquant_int8(grad_uniq)
        send = jnp.zeros((S * C, D), jnp.int8)
        send = send.at[route.pos].set(q, mode="drop")
        ssc = jnp.zeros((S * C,), jnp.float32)
        ssc = ssc.at[route.pos].set(scale, mode="drop")
        recv_q = _all_to_all(spec, send.reshape(S, C, D)).reshape(S * C, D)
        recv_sc = _all_to_all(spec, ssc.reshape(S, C)).reshape(S * C)
        recv = (recv_q.astype(grad_uniq.dtype)
                * recv_sc[:, None].astype(grad_uniq.dtype))
    else:
        wd = wire_dtype or grad_uniq.dtype
        send = jnp.zeros((S * C, D), wd)
        send = send.at[route.pos].set(grad_uniq.astype(wd), mode="drop")
        recv = _all_to_all(spec, send.reshape(S, C, D)).reshape(
            S * C, D).astype(grad_uniq.dtype)

    flat_ids = route.recv_ids.reshape(-1)
    local = jnp.where(flat_ids >= 0, flat_ids // S, spec.rows_per_shard)
    # same row may arrive from several shards: dedup locally and sum
    uniq_local, inv = jnp.unique(local, size=S * C, return_inverse=True,
                                 fill_value=spec.rows_per_shard)
    row_grads = jax.ops.segment_sum(recv, inv.reshape(-1),
                                    num_segments=S * C)
    row_counts = None
    if counts_uniq is not None:
        send_cnt = jnp.zeros((S * C,), jnp.int32)
        send_cnt = send_cnt.at[route.pos].set(counts_uniq, mode="drop")
        recv_cnt = _all_to_all(spec, send_cnt.reshape(S, C)).reshape(S * C)
        row_counts = jax.ops.segment_sum(recv_cnt, inv.reshape(-1),
                                         num_segments=S * C)
    row_mask = uniq_local < spec.rows_per_shard
    return uniq_local, row_grads, row_counts, row_mask
