"""Run configuration.

TPU-native replacement for the reference's four config mechanisms
(`python/hetu/gpu_ops/executor.py:113-192` HetuConfig kwargs,
`python/hetu/distribute.py:14-89` yaml cluster config, DMLC_* env vars, and
entry-script argparse). On TPU there is no parameter-server role split, so a
single dataclass covers executor + cluster + cache + scheduler settings.
"""

from __future__ import annotations

import dataclasses
import json
from typing import Any, Optional, Sequence

import jax
import numpy as np


@dataclasses.dataclass
class HeraldConfig:
    """Training-engine configuration.

    Attributes mirror the knobs of the reference entry scripts
    (`examples/ctr/run_laia.py:327-356`): comm mode, cache policy/limit,
    staleness bound, bsp, batch size, embedding size — re-expressed for a
    single-program SPMD TPU runtime.
    """

    # --- model / data ---
    model: str = "wdl_criteo"
    batch_size: int = 256           # per-worker (per-device) batch size,
                                    # matching the reference's per-worker batch
    embedding_dim: int = 128
    dtype: Any = np.float32         # dense compute dtype
    table_dtype: Any = np.float32   # embedding table dtype

    # --- optimizer ---
    optimizer: str = "sgd"
    learning_rate: float = 0.01
    lr_schedule: str = "constant"      # constant|step|multistep|exp|cosine
    lr_schedule_kwargs: Optional[dict] = None
    # embedding rows can use a different optimizer (reference server-side
    # optimizers, ps-lite/include/ps/server/optimizer.h support this split)
    embed_optimizer: Optional[str] = None
    embed_learning_rate: Optional[float] = None

    # --- parallelism ---
    # 'local'  : single device, plain gather (reference comm_mode None)
    # 'hybrid' : row-sharded tables + all-to-all exchange for embeddings,
    #            data-parallel dense tower (reference comm_mode Hybrid)
    comm_mode: str = "local"
    mesh_shape: Optional[Sequence[int]] = None   # default: (num_devices,)
    mesh_axes: Sequence[str] = ("dp",)
    # tensor-parallel (Megatron-style) dense tower: the mesh becomes 2-D
    # (num_devices // mp_shards, mp_shards) with axes (dp, mp). The
    # embedding table stays row-sharded over ALL devices (the all-to-all
    # exchange rides the flattened (dp, mp) axes unchanged), while the
    # dense tower's weight matrices are column/row-sharded over 'mp' with
    # a psum after each row-parallel layer. TPU-native rebuild of the
    # reference's intra-layer model parallelism (`python/hetu/context.py:
    # 364-596` state inference + `distribute.py:154-378`
    # OneWeirdTrick4CNN: DP feature path + MP fully-connected layers).
    mp_shards: int = 1
    # static capacity factor for all-to-all buckets: capacity per
    # (src, dst) pair = ceil(unique_ids / num_shards) * factor
    a2a_capacity_factor: float = 2.0
    # explicit per-(src,dst) ID-slot capacities, overriding the factor
    # sizing. The scheduled path's traffic win materializes as smaller
    # static all-to-all buffers: size these from the planner's measured
    # max per-owner pull/flush counts (benchmarks/mesh_ab.py does this)
    # and the compiled step moves proportionally fewer bytes.
    a2a_pull_capacity: Optional[int] = None     # forward/pull exchange
    a2a_flush_capacity: Optional[int] = None    # cached-mode flush exchange
    # per-worker flush-array length (cached mode). Default U_cap covers the
    # worst case (every batch key evicting); a probe-measured value shrinks
    # the padded flush scatter passes to near-zero in the big-cache regime.
    # The planner raises if a program ever exceeds it (nothing truncates).
    sched_flush_slots: Optional[int] = None
    # per-worker unique-key capacity (cached mode). Default batch*fields is
    # the worst case; real CTR batches dedup 4-5x below it, and every cache
    # pass (dedup sort, pull gather, insert/update scatters) is as wide as
    # this. Size from a probe (sizing.TrafficProfile.unique_slots); the
    # planner raises if a batch's uniques ever exceed it.
    sched_unique_slots: Optional[int] = None
    # pull smoothing (cached mode): when set, the planner hoists pulls of
    # batches whose per-(worker,owner) bucket exceeds this target into
    # earlier underfull batches as prefetches (within sched_hoist_window
    # batches, up to sched_prefetch_slots per worker per step). The static
    # pull capacity can then sit near the MEAN bucket size instead of the
    # max — size both from a probe (sizing.py). Value-safe by
    # construction; the planner only hoists pulls whose row cannot change
    # between the prefetch and the read.
    sched_pull_target: Optional[int] = None
    sched_hoist_window: int = 8
    sched_prefetch_slots: Optional[int] = None
    # planner per-(owner) planned-flush budget per step (cached mode).
    # None = the flush exchange's wire capacity (classic behavior: fill
    # the wire). Setting it BELOW the wire capacity makes the planner
    # defer more planned flushes (rows stay dirty longer — bounded
    # staleness in the reference's --bound spirit, run_laia.py:351
    # defaults bound=100), which shrinks the measured flush-bucket
    # maxima and therefore the flush wire itself. Deferral emits oldest
    # delta first, so no candidate starves. Size with
    # sizing.sweep_flush_budget; the overflow counter certifies the fit.
    sched_flush_budget: Optional[int] = None
    # flush-free program variant (cached mode): chunks whose programs
    # carry zero flushes dispatch a compiled variant without the flush
    # phase (no F_cap gather, no flush exchange, no owner scatter pair) —
    # the steady state of the solo/big-cache regime. Bit-exact (a flush
    # phase fed all-sentinel ids is a no-op); dispatch is a pure function
    # of the planner stream, so resume replays identically.
    sched_noflush_variant: bool = True
    # pull-free program variant (cached mode): a flush-free chunk whose
    # programs ALSO carry zero pulls and zero prefetch hoists (every
    # batch key resident and fresh — the solo/big-cache steady state
    # after the first epoch, where nothing misses and no remote writer
    # creates staleness) dispatches a variant with the whole pull phase
    # removed: no U_cap+P_cap table gather, no pull exchange, no
    # prefetch-insert scatter. Bit-exact (the pull phase fed all-false
    # masks and all-sentinel ids selects the resident rows everywhere);
    # dispatch is a pure function of the planner stream, like noflush.
    sched_nopull_variant: bool = True
    # packed program wire (cached mode, single-shard): ship each chunk's
    # 7-9 program arrays as ONE uint8 buffer per device_put instead of
    # one put per array. On remote-transport backends every individual
    # put pays a fixed dispatch latency comparable to a ~2 MB payload
    # (docs/PERF_NOTES.md), so the per-chunk staging cost collapses ~8x;
    # the epoch program unpacks on device with static slices + bitcasts
    # (layout ops, ~free next to the step). Bit-exact by construction
    # (tests/test_packed_wire.py pins it against the unpacked wire).
    sched_packed_wire: bool = True
    # staged-chunk memo (cached mode, single-shard packed wire): an
    # epoch-repeat stream re-plans byte-identical chunk programs, so the
    # engine keeps up to sched_chunk_memo_mb MB of recently staged
    # packed buffers (host copy + device array) keyed by content; when a
    # freshly planned chunk's bytes EQUAL a memoized buffer — verified
    # by a full memcmp, so reuse is bit-exact by construction — the
    # device_put is skipped and the resident buffer dispatches again.
    # Live (in-situ) planning then converges to plan-tape throughput on
    # fixed streams while the planner still plans and verifies every
    # step online. The memo is a sliding LRU window over the stream:
    # when the budget holds at least one epoch's distinct programs, the
    # window converges to "the previous epoch" — exactly what the next
    # epoch replays. A stream that churns 4x the budget without one
    # reuse (shuffled, or budget under an epoch) disables the memo and
    # costs only a sampled-key probe per chunk until then.
    sched_chunk_memo: bool = True
    sched_chunk_memo_mb: int = 256
    # flush gradient-delta wire dtype (cached mode). None = the delta
    # dtype (f32, exact). jnp.bfloat16 halves the flush all-to-all bytes;
    # accumulation at the owner stays f32, so only the per-row delta is
    # quantized once per flush — the standard DLRM-style gradient
    # compression trade (opt-in: breaks bit-exactness vs the plain
    # engine, bounded relative error per flush).
    flush_wire_dtype: Any = None
    # Pallas DMA gather kernel for embedding lookups (ops/pallas/kernels).
    # Measured on v5e (docs/PERF_NOTES.md): per-row DMA is issue-rate-bound
    # (~100 ns/descriptor) and LOSES to XLA's gather (~680 us vs ~154 us at
    # N=6656), so this stays off by default; the kernel is kept as the
    # scaffold for row-group DMA batching (wide tables amortize descriptors).
    use_pallas_gather: bool = False

    # --- dense-sync relaxation (the PartialReduce / bounded-sync analog) ---
    # The reference's PartialReduce lets a subset of ready workers
    # allreduce without waiting for the rest (`gpu_ops/PartialReduce.py`,
    # partial_reduce client) — a straggler dodge that has no meaning in
    # lockstep SPMD, where every device runs the same program. What DOES
    # carry over is the knob it exposes: trade dense-gradient sync
    # freshness for less collective work per step. TPU-native form:
    #   dense_sync_group g  — each step, dense grads all-reduce over
    #     static SUBGROUPS of g dp-workers (replica_groups of size g)
    #     instead of the whole axis; g=1 means purely local updates
    #     (local SGD).
    #   dense_sync_every k — every k-th step (and always at the end of a
    #     scanned chunk, so jit-boundary state is exactly replicated and
    #     checkpoints/eval never see divergent replicas) dense params AND
    #     optimizer slots are averaged over the whole dp axis, re-mixing
    #     the groups.
    # Defaults (1, 0=full axis) are exact BSP. The traffic saving needs
    # k > 1: with k=1 the per-step full model average costs MORE than
    # the single grad all-reduce it replaces — that corner exists as the
    # testable BSP-equivalence point (SGD g=1/k=1 == BSP exactly,
    # averaging commutes with the linear update; the engine warns if you
    # configure it). Per-step dispatch paths (train_step, FaeEngine)
    # have a jit boundary at every step, so k cannot defer their sync —
    # k takes effect in the scanned executor only (warned likewise).
    # The embedding path is never relaxed: routed sparse updates are
    # exact by construction. tests/test_dsync.py pins the corners.
    dense_sync_every: int = 1
    dense_sync_group: int = 0

    # --- hot-row cache (replaces src/hetu_cache) ---
    use_cache: bool = False
    cache_policy: str = "lru"            # lru | lfu | lfuopt
    cache_limit_ratio: float = 0.1       # fraction of table rows cached
    # pinned hot tier (cached mode): rows [0, pinned_rows) are REPLICATED
    # dense parameters updated with a psum every step instead of living in
    # the per-worker cache — kills the hot-row flush/refresh ping-pong
    # (requires frequency-remapped ids: herald_tpu.data.frequency_remap).
    # Extends the reference design (FAE's hot tier fused INTO the Herald
    # cached engine).
    pinned_rows: int = 0
    cache_limit: Optional[int] = None    # absolute row count, overrides ratio
    staleness_bound: int = 0             # reference --bound

    # --- lookahead scheduler (replaces laia/) ---
    use_scheduler: bool = False
    # planner produce-ahead depth in batches (the reference's 5-deep
    # laia_dataloader prefetch window analog). Sized to cover at least
    # one scan chunk of lookahead so popping chunk t+1 while the device
    # runs chunk t never stalls on the producer; bounded so a killed run
    # wastes little planned-ahead work (~40 KB/program at default caps)
    sched_queue_size: int = 64
    sched_top_k_tables: Optional[int] = None
    sched_threads: int = 8
    # per-epoch sample reshuffle (0 = fixed epoch order like the
    # reference's Laia matrix). Deterministic (seed ^ epoch Fisher-Yates
    # inside the planner), so mid-epoch resume replays identically.
    sched_shuffle_seed: int = 0

    # --- runtime ---
    seed: int = 0
    log_dir: Optional[str] = None
    prefetch: bool = True                # host->device prefetch pipeline

    def __post_init__(self):
        if self.embed_optimizer is None:
            self.embed_optimizer = self.optimizer
        if self.embed_learning_rate is None:
            self.embed_learning_rate = self.learning_rate
        if self.dense_sync_every < 1:
            raise ValueError("dense_sync_every must be >= 1")
        if self.dense_sync_group < 0:
            raise ValueError("dense_sync_group must be >= 0 (0 = full axis)")
        if self.dense_sync_every > 1 or self.dense_sync_group > 0:
            if self.comm_mode != "hybrid":
                raise ValueError(
                    "dense_sync_every/_group relax the dp dense-grad "
                    "all-reduce; they require comm_mode='hybrid'")
            if self.mp_shards > 1:
                raise ValueError(
                    "dense-sync relaxation is dp-only: the Megatron tower's "
                    "in-layer psums are part of the forward math and cannot "
                    "be made stale")
        if self.mp_shards > 1:
            if self.comm_mode != "hybrid":
                raise ValueError("mp_shards > 1 requires comm_mode='hybrid'")
            if self.use_cache or self.use_scheduler:
                raise ValueError(
                    "mp_shards > 1 composes with the plain hybrid engine "
                    "only; the cached/scheduled path is dp-only (the "
                    "reference's MP strategies likewise never compose with "
                    "the embedding cache)")
            if self.optimizer == "lamb":
                raise ValueError(
                    "lamb's full-tensor trust ratio needs global norms, "
                    "which the mp-sharded dense tower does not psum; use an "
                    "elementwise dense optimizer with mp_shards > 1")

    # ------------------------------------------------------------------
    def make_mesh(self, devices=None) -> jax.sharding.Mesh:
        """Build the device mesh this config trains over."""
        if devices is None:
            devices = jax.devices()
        if self.mp_shards > 1:
            n = len(devices)
            if self.mesh_shape:
                shape = tuple(self.mesh_shape)
                n = int(np.prod(shape))
                if shape[-1] != self.mp_shards or len(shape) != 2:
                    raise ValueError(
                        f"mesh_shape {shape} must be (dp, mp_shards="
                        f"{self.mp_shards}) when mp_shards > 1")
            else:
                if n % self.mp_shards:
                    raise ValueError(
                        f"{n} devices not divisible by mp_shards="
                        f"{self.mp_shards}")
                shape = (n // self.mp_shards, self.mp_shards)
            axes = (self.mesh_axes[0], "mp")
            return jax.sharding.Mesh(
                np.array(devices[:n]).reshape(shape), axes)
        shape = tuple(self.mesh_shape) if self.mesh_shape else (len(devices),)
        n = int(np.prod(shape))
        dev_array = np.array(devices[:n]).reshape(shape)
        return jax.sharding.Mesh(dev_array, tuple(self.mesh_axes))

    def cache_rows(self, table_rows: int) -> int:
        if self.cache_limit is not None:
            return int(self.cache_limit)
        return max(1, int(table_rows * self.cache_limit_ratio))

    # ------------------------------------------------------------------
    def to_json(self) -> str:
        d = dataclasses.asdict(self)
        d["dtype"] = np.dtype(self.dtype).name
        d["table_dtype"] = np.dtype(self.table_dtype).name
        d["flush_wire_dtype"] = (np.dtype(self.flush_wire_dtype).name
                                 if self.flush_wire_dtype is not None
                                 else None)
        return json.dumps(d, indent=2)

    @classmethod
    def from_json(cls, s: str) -> "HeraldConfig":
        d = json.loads(s)
        d["dtype"] = np.dtype(d["dtype"]).type
        d["table_dtype"] = np.dtype(d["table_dtype"]).type
        if d.get("flush_wire_dtype"):
            d["flush_wire_dtype"] = np.dtype(d["flush_wire_dtype"]).type
        return cls(**d)
