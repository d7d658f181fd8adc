"""Distributed GCN over a device mesh — the DistGCN_15d rebuild.

Reference: `/root/reference/python/hetu/gpu_ops/DistGCN_15d.py` (1.5-D
partitioned GCN: staged NCCL broadcasts of full feature blocks + local
CSR SpMM + row-group allreduce, hand-written gradient op) and its
2-layer model `tests/test_DistGCN/test_model_distGCN15d.py`.

TPU-native redesign:

* **Aggregation is an embedding pull.** Ā@(HW) needs, per shard, the HW
  rows of the sources its edges reference — exactly the sparse-lookup
  pattern `parallel/exchange.py` already implements. We dedup local
  source ids, `route_ids` + `gather_rows` them from the strided-sharded
  activation table, and segment-sum into owned destination rows. Wire
  traffic is (unique referenced rows) x F' per step, vs the reference's
  broadcast of EVERY block to every worker (N x F' regardless of the
  edge structure).
* **No hand-written gradient.** The reference writes `gradient()` by
  hand (DistGCN_15d.py:117-141: a second broadcast pass on the output
  grad + weight-grad allreduce). Here `jax.grad` differentiates through
  the collectives: the gather's all_to_all transposes to the scatter
  all_to_all automatically.
* **Static shapes throughout**: per-shard edge lists and dedup widths
  are padded to fixed capacities (overflow counted, never silent), so
  one compiled program serves every step.

The disjoint-loss rule (see docs/PERF_NOTES.md): every node is owned by
exactly one shard, so per-shard masked CE terms are disjoint and the
psum-normalized mean is exact.
"""

from __future__ import annotations

import dataclasses
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from herald_tpu.parallel.exchange import (
    ExchangeSpec, Route, gather_rows, make_exchange, route_ids,
)
from .graph import (Graph, ShardedGraph, partition_edges,
                    plan_halo_exchange, shard_node_array)


@dataclasses.dataclass(frozen=True)
class GCNConfig:
    feat_dim: int
    hidden_dim: int
    num_classes: int
    num_layers: int = 2
    learning_rate: float = 0.5
    seed: int = 0


def init_gcn_params(cfg: GCNConfig) -> List[Tuple[jnp.ndarray, jnp.ndarray]]:
    """Glorot-uniform weights + zero bias per layer (replicated)."""
    dims = ([cfg.feat_dim] + [cfg.hidden_dim] * (cfg.num_layers - 1)
            + [cfg.num_classes])
    rng = np.random.RandomState(cfg.seed)
    params = []
    for din, dout in zip(dims[:-1], dims[1:]):
        lim = np.sqrt(6.0 / (din + dout))
        w = rng.uniform(-lim, lim, size=(din, dout)).astype(np.float32)
        params.append((jnp.asarray(w), jnp.zeros((dout,), jnp.float32)))
    return params


def _dedup_and_route(spec: ExchangeSpec, src: jnp.ndarray,
                     uniq_cap: int) -> Tuple[jnp.ndarray, Route]:
    """Unique source ids (padded with N, routed once per step)."""
    uniq, inv = jnp.unique(src, size=uniq_cap,
                           fill_value=spec.num_rows, return_inverse=True)
    valid = uniq < spec.num_rows
    route = route_ids(spec, uniq, valid)
    return inv.reshape(-1), route


def _aggregate(spec: ExchangeSpec, hw_shard: jnp.ndarray,
               route: Route, inv: jnp.ndarray, dst_local: jnp.ndarray,
               weight: jnp.ndarray) -> jnp.ndarray:
    """Z_owned = sum over local edges of w_e * HW[src_e]."""
    vecs = gather_rows(spec, hw_shard, route)          # [U, D]
    contrib = vecs[inv] * weight[:, None]              # [E_cap, D]
    return jax.ops.segment_sum(contrib, dst_local,
                               num_segments=spec.rows_per_shard)


def _aggregate_broadcast(spec: ExchangeSpec, hw_shard: jnp.ndarray,
                         src: jnp.ndarray, dst_local: jnp.ndarray,
                         weight: jnp.ndarray) -> jnp.ndarray:
    """Reference data movement (DistGCN_15d.py broad_func:19-70): every
    shard receives EVERY feature block — one all_gather of the full HW
    table — then gathers locally. Kept as the A/B baseline; pad edges
    carry weight 0, so their (in-bounds) phys_index lookups contribute
    nothing."""
    if spec.num_shards > 1:
        full = lax.all_gather(hw_shard, spec.axis, tiled=True)
    else:
        full = hw_shard
    vecs = full.at[spec.phys_index(src)].get(mode="fill", fill_value=0)
    contrib = vecs * weight[:, None]
    return jax.ops.segment_sum(contrib, dst_local,
                               num_segments=spec.rows_per_shard)


def _aggregate_halo(spec: ExchangeSpec, hw_shard: jnp.ndarray,
                    send_slot: jnp.ndarray, edge_idx: jnp.ndarray,
                    dst_local: jnp.ndarray,
                    weight: jnp.ndarray) -> jnp.ndarray:
    """Static halo exchange (the default): the graph is fixed, so the
    rows each shard pair trades were computed host-side ONCE
    (`plan_halo_exchange`) — no per-step id routing, exact capacities,
    and rows owned locally never touch the wire."""
    if spec.num_shards > 1:
        S = spec.num_shards
        send = hw_shard.at[send_slot.reshape(-1)].get(
            mode="fill", fill_value=0)            # pad slot rps -> 0
        halo = lax.all_to_all(send.reshape(S, -1, hw_shard.shape[-1]),
                              spec.axis, split_axis=0, concat_axis=0,
                              tiled=False)
        table = jnp.concatenate(
            [hw_shard, halo.reshape(-1, hw_shard.shape[-1])], axis=0)
    else:
        table = hw_shard
    contrib = table[edge_idx] * weight[:, None]
    return jax.ops.segment_sum(contrib, dst_local,
                               num_segments=spec.rows_per_shard)


def gcn_forward(spec: ExchangeSpec, params, h_shard, src, dst_local,
                weight, uniq_cap: int, mode: str = "pull",
                halo_send=None, halo_idx=None):
    """Per-shard forward. Returns (logits [rps, C], overflow)."""
    if mode == "pull":
        inv, route = _dedup_and_route(spec, src, uniq_cap)
    h = h_shard
    for i, (w, b) in enumerate(params):
        if mode == "pull":
            agg = _aggregate(spec, h @ w, route, inv, dst_local, weight)
        elif mode == "halo":
            agg = _aggregate_halo(spec, h @ w, halo_send, halo_idx,
                                  dst_local, weight)
        else:
            agg = _aggregate_broadcast(spec, h @ w, src, dst_local,
                                       weight)
        h = agg + b
        if i + 1 < len(params):
            h = jax.nn.relu(h)
    ovf = route.overflow if mode == "pull" else jnp.zeros((), jnp.int32)
    return h, ovf


class GCN:
    """Full-batch semi-supervised node classification on a mesh.

    Single-device when `mesh` is None / one device; the same code path
    (exchange no-ops at S=1).
    """

    def __init__(self, cfg: GCNConfig, g: Graph, mesh: Mesh = None,
                 axis: str = "dp", capacity_factor: float = 2.0,
                 mode: str = "halo"):
        assert mode in ("halo", "pull", "broadcast")
        self.cfg = cfg
        self.g = g
        self.mesh = mesh
        self.mode = mode
        S = mesh.shape[axis] if mesh is not None else 1
        # uniq_cap before spec: capacity sizing needs ids_per_step
        self.spec = make_exchange(
            g.num_nodes, S, ids_per_step=g.num_nodes, axis=axis,
            capacity_factor=capacity_factor)
        self.sharded = partition_edges(self.spec, g)
        self.spec = make_exchange(
            g.num_nodes, S, ids_per_step=self.sharded.uniq_cap,
            axis=axis, capacity_factor=capacity_factor)

        spec, sg, rps = self.spec, self.sharded, self.spec.rows_per_shard
        uniq_cap = sg.uniq_cap
        if mode == "halo":
            self.plan = plan_halo_exchange(spec, g, sg)
            hs_np, hi_np = self.plan.send_slot, self.plan.edge_vec_idx
        else:
            self.plan = None
            hs_np = np.zeros((S, S, 1), np.int32)
            hi_np = np.zeros((S, 1), np.int32)
        halo_cap = hs_np.shape[-1]
        n_lab = shard_node_array(spec, g.labels, fill=0)
        n_tr = shard_node_array(spec, g.train_mask.astype(np.float32))
        n_ev = shard_node_array(spec, g.eval_mask.astype(np.float32))
        h0 = shard_node_array(spec, g.features)

        def per_shard_step(params, h0_s, src_s, dstl_s, w_s, hs_s, hi_s,
                           lab_s, m_s):
            src_s, dstl_s, w_s = (src_s.reshape(-1), dstl_s.reshape(-1),
                                  w_s.reshape(-1))
            hs_s = hs_s.reshape(S, halo_cap)
            hi_s = hi_s.reshape(-1)

            # DISJOINT-LOSS RULE (docs/PERF_NOTES.md): each shard seeds
            # only its OWN masked CE chunk — a replicated psum(x)/cnt
            # loss double-counts cotangents through the collective
            # transposes under check_vma=False. The global mean is
            # recovered by dividing by the psum'd count (a constant)
            # and psum-ing loss and grads afterwards.
            cnt = jnp.sum(m_s)
            if S > 1:
                cnt = lax.psum(cnt, axis)
            cnt = jnp.maximum(cnt, 1.0)

            def loss_fn(p):
                logits, ovf = gcn_forward(spec, p, h0_s, src_s, dstl_s,
                                          w_s, uniq_cap, mode,
                                          hs_s, hi_s)
                logp = jax.nn.log_softmax(logits)
                ce = -jnp.take_along_axis(
                    logp, lab_s[:, None].astype(jnp.int32), axis=1)[:, 0]
                return jnp.sum(ce * m_s) / cnt, ovf

            (loss, ovf), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(params)
            if S > 1:  # replicated params: reduce the disjoint terms
                loss = lax.psum(loss, axis)
                grads = jax.tree.map(lambda x: lax.psum(x, axis), grads)
            new = jax.tree.map(lambda p, dp: p - cfg.learning_rate * dp,
                               params, grads)
            return new, loss, ovf

        def per_shard_eval(params, h0_s, src_s, dstl_s, w_s, hs_s, hi_s,
                           lab_s, m_s):
            src_s, dstl_s, w_s = (src_s.reshape(-1), dstl_s.reshape(-1),
                                  w_s.reshape(-1))
            logits, _ = gcn_forward(spec, params, h0_s, src_s, dstl_s,
                                    w_s, uniq_cap, mode,
                                    hs_s.reshape(S, halo_cap),
                                    hi_s.reshape(-1))
            hit = (jnp.argmax(logits, axis=1) == lab_s) * m_s
            c, t = jnp.sum(hit), jnp.sum(m_s)
            if S > 1:
                c, t = lax.psum(c, axis), lax.psum(t, axis)
            return c, t

        if mesh is not None and S > 1:
            pn, pe, pr = P(axis), P(axis), P()
            specs = (pr, pn, pe, pe, pe, pe, pe, pn, pn)
            self._step = jax.jit(jax.shard_map(
                per_shard_step, mesh=mesh, in_specs=specs,
                out_specs=(pr, pr, pr), check_vma=False))
            self._eval = jax.jit(jax.shard_map(
                per_shard_eval, mesh=mesh, in_specs=specs,
                out_specs=(pr, pr), check_vma=False))
            dev = lambda x, s: jax.device_put(
                jnp.asarray(x), NamedSharding(mesh, s))
            self._data = (dev(h0.reshape(S, rps, -1).reshape(S * rps, -1),
                              pn),
                          dev(sg.src, pe), dev(sg.dst_local, pe),
                          dev(sg.weight, pe), dev(hs_np, pe),
                          dev(hi_np, pe), dev(n_lab, pn),
                          dev(n_tr, pn))
            self._eval_masks = dev(n_ev, pn)
        else:
            self._step = jax.jit(per_shard_step)
            self._eval = jax.jit(per_shard_eval)
            self._data = (jnp.asarray(h0), jnp.asarray(sg.src),
                          jnp.asarray(sg.dst_local),
                          jnp.asarray(sg.weight), jnp.asarray(hs_np),
                          jnp.asarray(hi_np), jnp.asarray(n_lab),
                          jnp.asarray(n_tr))
            self._eval_masks = jnp.asarray(n_ev)
        self.params = init_gcn_params(cfg)

    def train_step(self) -> Tuple[float, int]:
        self.params, loss, ovf = self._step(self.params, *self._data)
        return float(loss), int(ovf)

    def fit(self, epochs: int = 50, verbose: bool = False):
        for e in range(epochs):
            loss, ovf = self.train_step()
            if ovf:
                raise RuntimeError(
                    f"exchange overflow {ovf}: raise capacity_factor")
            if verbose and e % 10 == 0:
                print(f"epoch {e}: loss {loss:.4f}")
        return self

    def accuracy(self, split: str = "eval") -> float:
        mask = self._eval_masks if split == "eval" else self._data[7]
        c, t = self._eval(self.params, *self._data[:7], mask)
        return float(c) / max(float(t), 1.0)

    def logits(self) -> np.ndarray:
        """[N, C] logical-order logits (host helper, test oracle hook)."""
        h0, src, dstl, w, hs, hi = self._data[:6]
        S = self.spec.num_shards
        halo_cap = np.asarray(hs).shape[-1]
        if self.mesh is not None and S > 1:

            def fwd(params, h0_s, src_s, dstl_s, w_s, hs_s, hi_s):
                out, _ = gcn_forward(
                    self.spec, params, h0_s, src_s.reshape(-1),
                    dstl_s.reshape(-1), w_s.reshape(-1),
                    self.sharded.uniq_cap, self.mode,
                    hs_s.reshape(S, halo_cap), hi_s.reshape(-1))
                return out

            sm = jax.jit(jax.shard_map(
                fwd, mesh=self.mesh,
                in_specs=(P(), P("dp"), P("dp"), P("dp"), P("dp"),
                          P("dp"), P("dp")),
                out_specs=P("dp"), check_vma=False))
            phys = np.asarray(sm(self.params, h0, src, dstl, w, hs, hi))
        else:
            out, _ = gcn_forward(self.spec, self.params, h0,
                                 src.reshape(-1), dstl.reshape(-1),
                                 w.reshape(-1), self.sharded.uniq_cap,
                                 self.mode, hs.reshape(S, halo_cap),
                                 hi.reshape(-1))
            phys = np.asarray(out)
        return self.spec.to_logical(phys)
