"""Training engine: the TPU-native executor.

Replaces the reference's graph executor stack
(`python/hetu/gpu_ops/executor.py`: HetuConfig comm-mode resolution, stream
scheduling, PS registration, topo execution) with a single jit-compiled SPMD
train step over a `jax.sharding.Mesh`:

- comm_mode 'local'  -> plain gather + row-wise sparse update (one device);
- comm_mode 'hybrid' -> Herald's Hybrid: embedding table row-sharded over the
  mesh with all-to-all ID/vector exchange (replacing PS push/pull), dense
  tower data-parallel with `lax.pmean` (replacing NCCL allreduce,
  `python/hetu/gpu_ops/AllReduceCommunicate.py:16-52`).

The reference's five CUDA streams + event sync (`executor.py:313-325`)
disappear: XLA schedules compute/collective overlap; host->device transfer
overlaps via `jax.device_put` with donation.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from herald_tpu.config import HeraldConfig
from herald_tpu.models.base import ModelDef, bce_with_logits, get_model
from herald_tpu.optim import get_optimizer
from herald_tpu.parallel import exchange as ex
from herald_tpu.parallel import tp
from herald_tpu.utils import metrics as M


class TrainState(NamedTuple):
    """All trainable state; a pytree usable under jit with donation."""
    table: jnp.ndarray                 # [padded_rows, width] (row-sharded)
    table_slots: Dict[str, jnp.ndarray]
    dense: Dict[str, jnp.ndarray]
    dense_slots: Dict[str, Dict[str, jnp.ndarray]]
    step: jnp.ndarray                  # scalar int32


class Engine:
    """Builds and runs the jitted train/eval steps for one model."""

    def __init__(self, cfg: HeraldConfig, model: Optional[ModelDef] = None,
                 mesh: Optional[jax.sharding.Mesh] = None,
                 table_rows: Optional[int] = None):
        self.cfg = cfg
        self.model = model or get_model(cfg.model)
        self.width = self.model.emb_width(cfg.embedding_dim)
        self.num_rows = table_rows or self.model.table_rows
        self.dense_opt = get_optimizer(cfg.optimizer, cfg.learning_rate)
        self.embed_opt = get_optimizer(cfg.embed_optimizer,
                                       cfg.embed_learning_rate)
        from herald_tpu.optim.schedules import get_schedule
        sched_kw = cfg.lr_schedule_kwargs or {}
        self._lr_fn = get_schedule(cfg.lr_schedule, cfg.learning_rate,
                                   **sched_kw)
        self._elr_fn = get_schedule(cfg.lr_schedule,
                                    cfg.embed_learning_rate, **sched_kw)

        if cfg.comm_mode == "hybrid":
            self.mesh = mesh if mesh is not None else cfg.make_mesh()
            self.num_shards = int(np.prod(self.mesh.devices.shape))
        else:
            self.mesh = mesh  # optional single-device mesh
            self.num_shards = 1
        self.axis = cfg.mesh_axes[0]      # dp axis (loss / dense-grad psum)
        # tensor-parallel tower: the embedding exchange and the table
        # sharding ride the FLATTENED (dp, mp) axes (S = dp*mp shards, same
        # all-to-all as the 1-D mesh), while the dense tower is Megatron-
        # sharded over 'mp' (see parallel/tp.py and cfg.mp_shards)
        self.mp = cfg.mp_shards if cfg.comm_mode == "hybrid" else 1
        self.dp_shards = self.num_shards // max(self.mp, 1)
        self.flat_axes = (self.axis, "mp") if self.mp > 1 else self.axis
        if self.mp > 1:
            self._validate_tp()

        F = self.model.spec.num_sparse
        self.ids_per_worker = cfg.batch_size * F
        self.exchange = ex.make_exchange(
            self.num_rows, self.num_shards, self.ids_per_worker,
            axis=self.flat_axes, capacity_factor=cfg.a2a_capacity_factor,
            capacity=cfg.a2a_pull_capacity)
        # evaluation always pulls EVERY unique id (no cache, no planner),
        # so it keeps worst-case factor sizing even when the train
        # exchange is probe-sized tight (autosize) — and its overflow is
        # surfaced rather than silently zero-filling predictions
        self.eval_exchange = ex.make_exchange(
            self.num_rows, self.num_shards, self.ids_per_worker,
            axis=self.flat_axes, capacity_factor=cfg.a2a_capacity_factor)

        self._fast_local_sgd = (self.num_shards == 1
                                and self.embed_opt.name == "sgd"
                                and not cfg.use_cache)
        self._init_dsync()
        self._build_steps()

    def _init_dsync(self):
        """Dense-sync relaxation (config.dense_sync_every/_group): static
        subgroup gradient all-reduce + periodic full-axis model averaging.
        The TPU-native PartialReduce/local-SGD analog — see config.py."""
        cfg = self.cfg
        self.dsync_k = cfg.dense_sync_every
        g = cfg.dense_sync_group or self.dp_shards
        if self.num_shards > 1 and g > self.dp_shards:
            raise ValueError(
                f"dense_sync_group={g} exceeds the dp axis "
                f"({self.dp_shards} workers)")
        self.dsync_g = g if self.num_shards > 1 else 1
        self._dsync_on = (self.num_shards > 1 and
                          (self.dsync_k > 1 or self.dsync_g < self.dp_shards))
        if not self._dsync_on:
            self._dsync_groups = None
            return
        if self.dp_shards % self.dsync_g:
            raise ValueError(
                f"dense_sync_group={self.dsync_g} does not divide the dp "
                f"axis ({self.dp_shards} workers)")
        self._dsync_groups = [
            list(range(a, a + self.dsync_g))
            for a in range(0, self.dp_shards, self.dsync_g)]
        import warnings
        if self.dsync_k == 1:
            warnings.warn(
                "dense_sync_group with dense_sync_every=1 averages the "
                "full model every step — MORE collective bytes than exact "
                "BSP. Useful for equivalence testing only; set "
                "dense_sync_every > 1 for the traffic saving.",
                UserWarning, stacklevel=3)

    def _reduce_dense_grads(self, dgrads):
        """Per-step dense-grad reduction over the dp axis. Exact BSP by
        default; with dense_sync_group=g the all-reduce runs over static
        subgroups (replica_groups of size g in the compiled HLO — pinned
        by tests/test_dsync.py) and each group applies its own GROUP-mean
        gradient (loss_fn pre-scales by 1/S, so the group psum yields
        g/S of the group mean — rescale by S/g)."""
        if not self._dsync_on or self.dsync_g == self.dp_shards:
            return jax.lax.psum(dgrads, self.axis)
        r = jax.lax.psum(dgrads, self.axis,
                         axis_index_groups=self._dsync_groups)
        scale = self.num_shards / self.dsync_g
        return jax.tree.map(lambda v: v * scale, r)

    def _sync_dense(self, state):
        """Average dense params + optimizer slots over the whole dp axis
        (the periodic re-mix of local-SGD-with-model-averaging). Identity
        on already-replicated state up to fp (p*S/S)."""
        def mean(v):
            return (jax.lax.psum(v, self.axis) / self.dp_shards).astype(
                v.dtype)
        return state._replace(
            dense=jax.tree.map(mean, state.dense),
            dense_slots=jax.tree.map(mean, state.dense_slots))

    def _warn_per_step_dsync(self):
        """Per-step dispatch syncs at every jit boundary; k>1 only takes
        effect in the scanned executor. Warn once per engine."""
        if (self._dsync_on and self.dsync_k > 1
                and not getattr(self, "_dsync_warned", False)):
            self._dsync_warned = True
            import warnings
            warnings.warn(
                "dense_sync_every > 1 cannot defer syncs on per-step "
                "dispatch (every step is a jit boundary and must end "
                "replicated) — this path averages the model every step; "
                "use the scanned train_epoch* entry points for the "
                "traffic saving", UserWarning, stacklevel=3)

    def _maybe_sync_dense(self, state):
        """In-scan hook: full model average every dense_sync_every steps.
        The predicate is device-uniform (step is replicated), so the psum
        inside the cond executes on all devices or none."""
        if self.dsync_k == 1:
            return self._sync_dense(state)
        return jax.lax.cond(state.step % self.dsync_k == 0,
                            self._sync_dense, lambda s: s, state)

    def _validate_tp(self):
        """mp_shards > 1 sanity: the model must carry a Megatron tower and
        every sharded weight dim must divide by mp."""
        if self.model.apply_tp is None or not self.model.tp_plan:
            from herald_tpu.models.base import available_models, get_model
            tp_models = [m for m in available_models()
                         if get_model(m).apply_tp is not None]
            raise ValueError(
                f"model {self.model.name!r} has no tensor-parallel tower; "
                f"models supporting mp_shards > 1: {tp_models}")
        if self.num_shards % self.mp or self.dp_shards < 1:
            raise ValueError(
                f"mesh of {self.num_shards} devices cannot host "
                f"mp_shards={self.mp}")
        shapes = jax.eval_shape(
            lambda k: self.model.init_dense(k, self.cfg.embedding_dim),
            jax.random.PRNGKey(0))
        if not isinstance(shapes, dict) or not all(
                hasattr(v, "shape") for v in shapes.values()):
            raise ValueError(
                f"model {self.model.name!r}: TP towers must keep dense "
                f"params as a flat dict (tp_plan maps its keys)")
        for k, kind in self.model.tp_plan.items():
            s = shapes[k].shape
            dim = s[-1] if kind == "col" else s[0]
            if kind in ("col", "row") and dim % self.mp:
                raise ValueError(
                    f"param {k!r} ({kind}-parallel, shape {s}) not "
                    f"divisible by mp_shards={self.mp}")

    def _dense_pspec(self, name: str) -> P:
        """PartitionSpec of one dense param under the model's tp_plan."""
        kind = (self.model.tp_plan or {}).get(name, "rep")
        if self.mp == 1 or kind == "rep":
            return P()
        return P(None, "mp") if kind == "col" else P("mp", None)

    # ------------------------------------------------------------------
    # state init
    # ------------------------------------------------------------------
    def init_state(self, seed: Optional[int] = None) -> TrainState:
        seed = self.cfg.seed if seed is None else seed
        rng = jax.random.PRNGKey(seed)
        r_table, r_dense = jax.random.split(rng)
        padded = self.exchange.padded_rows

        def make_table(key):
            # generate directly in the table dtype: at reference scale
            # (33.7M x 128) an fp32 intermediate would double peak HBM
            dt = jnp.dtype(self.cfg.table_dtype)
            gen_dt = dt if dt in (jnp.float32, jnp.bfloat16) else jnp.float32
            t = 0.01 * jax.random.normal(key, (padded, self.width), gen_dt)
            return t.astype(dt)

        if self.num_shards > 1:
            tshard = NamedSharding(self.mesh, P(self.flat_axes, None))
            table = jax.jit(make_table, out_shardings=tshard)(r_table)
            slots = {
                k: jax.jit(lambda t=table: jnp.zeros_like(t),
                           out_shardings=tshard)()
                for k in self.embed_opt.slot_names
            }
        else:
            table = jax.jit(make_table)(r_table)
            slots = {k: jnp.zeros_like(table)
                     for k in self.embed_opt.slot_names}

        dense = self.model.init_dense(r_dense, self.cfg.embedding_dim)
        dense_slots = jax.tree.map(
            self.dense_opt.init_slots, dense,
            is_leaf=lambda x: isinstance(x, jnp.ndarray))
        step = jnp.zeros((), jnp.int32)
        if self.num_shards > 1:
            rep = NamedSharding(self.mesh, P())
            if self.mp > 1:
                # Megatron shardings per tp_plan: the GLOBAL param values
                # are identical to single-device init; only placement splits
                dense = {k: jax.device_put(
                    v, NamedSharding(self.mesh, self._dense_pspec(k)))
                    for k, v in dense.items()}
                dense_slots = {
                    k: jax.device_put(
                        v, NamedSharding(self.mesh, self._dense_pspec(k)))
                    for k, v in dense_slots.items()}
            else:
                dense = jax.device_put(dense, rep)
                dense_slots = jax.device_put(dense_slots, rep)
            # replicate over the WHOLE mesh: a single-device scalar would
            # mix device sets with the sharded table in multi-process runs
            step = jax.device_put(step, rep)
        return TrainState(table=table, table_slots=slots, dense=dense,
                          dense_slots=dense_slots, step=step)

    # ------------------------------------------------------------------
    # per-device step bodies (run inside shard_map for hybrid mode)
    # ------------------------------------------------------------------
    def _gather_local(self, table, ids_flat, valid=None):
        """Local-table gather, XLA or Pallas per config. Invalid entries
        (valid=False) return arbitrary rows when the Pallas kernel is on —
        callers must not consume them (the dedup inverse never does)."""
        if self.cfg.use_pallas_gather:
            from herald_tpu.ops.pallas import embedding_gather
            safe = ids_flat if valid is None else \
                jnp.where(valid, ids_flat, 0)
            return embedding_gather(table, safe)
        if valid is None:
            return jnp.take(table, ids_flat, axis=0)
        safe = jnp.where(valid, ids_flat, table.shape[0] + 1)
        return table.at[safe].get(mode="fill", fill_value=0)

    def _forward_embeddings(self, table, ids, spec=None):
        """ids [B, F] -> (emb [B, F, W], uniq, inv, route|None, overflow).
        `spec` overrides the exchange (eval uses the wide one)."""
        spec = spec or self.exchange
        B, F = ids.shape
        U = B * F
        uniq, inv = jnp.unique(ids.reshape(-1), size=U, return_inverse=True,
                               fill_value=-1)
        valid = uniq >= 0
        if self.num_shards > 1:
            route = ex.route_ids(spec, uniq, valid)
            emb_uniq = ex.gather_rows(spec, table, route)
            overflow = route.overflow
        else:
            route = None
            emb_uniq = self._gather_local(table, uniq, valid)
            overflow = jnp.zeros((), jnp.int32)
        emb = emb_uniq[inv.reshape(-1)].reshape(B, F, self.width)
        return emb, uniq, inv, route, overflow

    def _apply_sparse_grads(self, table, slots, step, uniq, inv, route,
                            emb_grad):
        """Route per-unique-ID grads to their owner shard and update rows.

        Reference analog: IndexedSlices dedup + `kPushEmbedding` +
        server-side ApplySparse (`PSFhandle_embedding.cc:5-28`,
        `server/optimizer.h`).
        """
        U = uniq.shape[0]
        D = emb_grad.shape[-1]
        g_uniq = jax.ops.segment_sum(emb_grad.reshape(-1, D),
                                     inv.reshape(-1), num_segments=U)
        # grads arrive pre-summed over duplicates (the reference's Hybrid
        # path likewise sums, optimizer.py:148-160); ApplyCache count
        # scaling is opt-in via apply_rows(counts=) and not used here, so
        # the counts all-to-all is skipped entirely
        if self.num_shards > 1:
            rows_idx, row_grads, _, row_mask = ex.scatter_grads(
                self.exchange, route, g_uniq)
        else:
            rows_idx = jnp.where(uniq >= 0, uniq, self.exchange.padded_rows)
            row_grads = g_uniq
            row_mask = uniq >= 0

        safe_idx = jnp.where(row_mask, rows_idx, 0)
        rows = table[safe_idx]
        row_slots = {k: v[safe_idx] for k, v in slots.items()}
        new_rows, new_slots = self.embed_opt.apply_rows(
            rows, row_grads.astype(rows.dtype), row_slots, step,
            lr=self._elr_fn(step), mask=row_mask)
        drop_idx = jnp.where(row_mask, rows_idx, table.shape[0] + 1)
        # cast back to the storage dtypes: scattering f32 optimizer output
        # into a bf16 table would make XLA materialize a full-table f32
        # convert (17 GB at reference scale)
        table = table.at[drop_idx].set(new_rows.astype(table.dtype),
                                       mode="drop")
        slots = dict(slots)
        for k in slots:
            slots[k] = slots[k].at[drop_idx].set(
                new_slots[k].astype(slots[k].dtype), mode="drop")
        return table, slots

    def _train_step_body(self, state: TrainState, dense_x, ids, labels):
        if self._fast_local_sgd:
            return self._train_step_body_fast(state, dense_x, ids, labels)
        step = state.step + 1
        emb, uniq, inv, route, overflow = self._forward_embeddings(
            state.table, ids)

        # Each device's loss contribution is scaled by 1/num_shards so the
        # psum over the mesh gives the *global-batch mean* — keeping sparse
        # and dense gradients numerically identical to single-device
        # training (asserted by tests/test_parity.py).
        inv_shards = 1.0 / self.num_shards
        if self.mp > 1:
            # TP tower: every mp peer runs the tower over the mp GROUP's
            # combined batch (embeddings/features all-gathered over 'mp'),
            # but each peer's LOSS covers only its own batch chunk — the
            # per-device losses stay disjoint, so autodiff through the
            # in-tower psum/all_gather transposes sums each sample's
            # cotangent exactly once (no replicated-loss double counting,
            # regardless of whether a param's path crosses a collective).
            # Grad parity vs single-device is pinned by tests/test_tp.py.
            dx_g = tp.gather_batch(dense_x, "mp")
            B_local = dense_x.shape[0]

            def loss_fn(dense_params, emb):
                emb_g = tp.gather_batch(emb, "mp")
                logits = self.model.apply_tp(
                    dense_params, emb_g.astype(jnp.float32), dx_g, "mp")
                logits = tp.my_batch_chunk(logits, B_local, "mp")
                return bce_with_logits(logits, labels) * inv_shards
        else:
            def loss_fn(dense_params, emb):
                logits = self.model.apply(
                    dense_params, emb.astype(jnp.float32), dense_x)
                return bce_with_logits(logits, labels) * inv_shards

        (loss, (dgrads, emb_grad)) = jax.value_and_grad(
            loss_fn, argnums=(0, 1))(state.dense, emb)

        if self.num_shards > 1:
            loss = jax.lax.psum(loss, self.flat_axes)
            if self.mp > 1:
                # sharded params ('col'/'row'): the chunk-loss cotangents
                # already mixed across mp inside the tower transposes, so
                # each peer's shard grad is group-complete — reduce over dp
                # only. Replicated params sit on collective-free paths
                # (FM terms, cross layers, tiny heads), so each peer holds
                # just its chunk's contribution — reduce over dp AND mp.
                plan = self.model.tp_plan or {}
                dgrads = {
                    k: jax.lax.psum(
                        v, self.axis if plan.get(k, "rep") != "rep"
                        else self.flat_axes)
                    for k, v in dgrads.items()}
            else:
                dgrads = self._reduce_dense_grads(dgrads)
            overflow = jax.lax.psum(overflow, self.flat_axes)

        dense, dense_slots = self.dense_opt.apply_dense(
            state.dense, dgrads, state.dense_slots, step,
            lr=self._lr_fn(step))
        table, table_slots = self._apply_sparse_grads(
            state.table, state.table_slots, step, uniq, inv, route, emb_grad)

        new_state = TrainState(table=table, table_slots=table_slots,
                               dense=dense, dense_slots=dense_slots,
                               step=step)
        stats = {"loss": loss, "overflow": overflow}
        return new_state, stats

    def _train_step_body_fast(self, state: TrainState, dense_x, ids, labels):
        """Single-device SGD fast path: no dedup needed — scatter-add of
        duplicate rows is exact for SGD (the reference's AllReduce-only
        sparse path makes the same observation, `OptimizersSparse.cu`
        sgd_update)."""
        step = state.step + 1
        emb = self._gather_local(state.table, ids.reshape(-1)).reshape(
            *ids.shape, -1).astype(jnp.float32)

        def loss_fn(dense_params, emb):
            logits = self.model.apply(dense_params, emb, dense_x)
            return bce_with_logits(logits, labels)

        loss, (dgrads, emb_grad) = jax.value_and_grad(
            loss_fn, argnums=(0, 1))(state.dense, emb)
        dense, dense_slots = self.dense_opt.apply_dense(
            state.dense, dgrads, state.dense_slots, step,
            lr=self._lr_fn(step))
        lr = self._elr_fn(step)
        flat_g = emb_grad.reshape(-1, emb_grad.shape[-1])
        table = state.table.at[ids.reshape(-1)].add(
            (-lr * flat_g).astype(state.table.dtype))
        new_state = TrainState(table=table, table_slots=state.table_slots,
                               dense=dense, dense_slots=dense_slots,
                               step=step)
        return new_state, {"loss": loss,
                           "overflow": jnp.zeros((), jnp.int32)}

    def _epoch_body(self, state: TrainState, dense_k, ids_k, labels_k):
        """K train steps fused in one jit call via lax.scan.

        Replaces the reference's per-iteration `executor.run("train")`
        dispatch (`gpu_ops/executor.py:905`): on TPU the per-call host
        latency dominates small CTR steps, so the executor scans whole
        batch-chunks on device.
        """
        def body(state, xs):
            d, s, y = xs
            state, stats = self._train_step_body(state, d, s, y)
            if self._dsync_on:
                state = self._maybe_sync_dense(state)
            return state, (stats["loss"], stats["overflow"])

        state, (losses, overflows) = jax.lax.scan(
            body, state, (dense_k, ids_k, labels_k))
        if self._dsync_on:
            # chunk boundary: jit-boundary dense state must be exactly
            # replicated (out_specs P()); checkpoints/eval see synced params
            state = self._sync_dense(state)
        return state, {"loss": losses, "overflow": overflows}

    def _eval_step_body(self, state: TrainState, dense_x, ids):
        emb, _, _, _, overflow = self._forward_embeddings(
            state.table, ids, spec=self.eval_exchange)
        if self.mp > 1:
            emb_g = tp.gather_batch(emb, "mp")
            dx_g = tp.gather_batch(dense_x, "mp")
            logits = self.model.apply_tp(
                state.dense, emb_g.astype(jnp.float32), dx_g, "mp")
            # group logits are replicated across mp; hand back my chunk so
            # the out_spec stays batch-sharded over the flat axes
            logits = tp.my_batch_chunk(logits, ids.shape[0], "mp")
        else:
            logits = self.model.apply(state.dense, emb.astype(jnp.float32),
                                      dense_x)
        if self.num_shards > 1:
            overflow = jax.lax.psum(overflow, self.flat_axes)
        return jax.nn.sigmoid(logits), overflow

    def _eval_scan_body(self, state: TrainState, dense_k, ids_k):
        """Scanned eval: T batches per device call. Per-batch eval paid
        ~3 transport round trips (2 puts + 1 readback) per batch — on
        tunnel transports that is minutes per 1M-row epoch eval; the
        scan folds T batches into one put + one dispatch + one readback.
        Same math as _eval_step_body (the reference's per-epoch val loop
        is examples/ctr/run_laia.py:266-289)."""
        def body(c, xs):
            d, s = xs
            p, ov = self._eval_step_body(state, d, s)
            return c, (p, ov)
        _, (probs, ov) = jax.lax.scan(body, 0, (dense_k, ids_k))
        return probs, ov.sum()

    # ------------------------------------------------------------------
    # jit / shard_map wiring
    # ------------------------------------------------------------------
    def _build_steps(self):
        if self.num_shards > 1:
            ax = self.flat_axes
            dense_tree = jax.eval_shape(
                lambda k: self.model.init_dense(k, self.cfg.embedding_dim),
                jax.random.PRNGKey(0))
            if self.mp > 1:
                # TP towers carry flat dicts (enforced by _validate_tp);
                # specs follow the per-param tp_plan
                dense_specs = {k: self._dense_pspec(k) for k in dense_tree}
                dslot_specs = {
                    k: {s: self._dense_pspec(k)
                        for s in self.dense_opt.slot_names}
                    for k in dense_tree}
            else:
                # any param pytree shape (e.g. layers.Sequence lists)
                dense_specs = jax.tree.map(lambda _: P(), dense_tree)
                dslot_specs = jax.tree.map(
                    lambda _: {k: P() for k in self.dense_opt.slot_names},
                    dense_tree)
            state_specs = TrainState(
                table=P(ax, None),
                table_slots={k: P(ax, None)
                             for k in self.embed_opt.slot_names},
                dense=dense_specs,
                dense_slots=dslot_specs,
                step=P(),
            )
            data_spec = P(ax)
            stats_spec = {"loss": P(), "overflow": P()}

            def step_body(state, d, s, y):
                state, stats = self._train_step_body(state, d, s, y)
                if self._dsync_on:
                    # standalone single-step entry: always leave the jit
                    # boundary replicated (dense_sync_every takes effect
                    # only inside the scanned executor)
                    state = self._sync_dense(state)
                return state, stats

            train_sm = jax.shard_map(
                step_body, mesh=self.mesh,
                in_specs=(state_specs, data_spec, data_spec, data_spec),
                out_specs=(state_specs, stats_spec),
                check_vma=False)
            eval_sm = jax.shard_map(
                self._eval_step_body, mesh=self.mesh,
                in_specs=(state_specs, data_spec, data_spec),
                out_specs=(data_spec, P()),
                check_vma=False)
            kdata_spec = P(None, ax)   # [K, steps] stacked batches
            epoch_sm = jax.shard_map(
                self._epoch_body, mesh=self.mesh,
                in_specs=(state_specs, kdata_spec, kdata_spec, kdata_spec),
                out_specs=(state_specs, stats_spec),
                check_vma=False)
            eval_scan_sm = jax.shard_map(
                self._eval_scan_body, mesh=self.mesh,
                in_specs=(state_specs, kdata_spec, kdata_spec),
                out_specs=(kdata_spec, P()),
                check_vma=False)
            self._train_step = jax.jit(train_sm, donate_argnums=(0,))
            self._train_epoch = jax.jit(epoch_sm, donate_argnums=(0,))
            self._eval_step = jax.jit(eval_sm)
            self._eval_scan = jax.jit(eval_scan_sm)
            self._data_sharding = NamedSharding(self.mesh, P(ax))
            self._kdata_sharding = NamedSharding(self.mesh, P(None, ax))
        else:
            self._train_step = jax.jit(self._train_step_body,
                                       donate_argnums=(0,))
            self._train_epoch = jax.jit(self._epoch_body,
                                        donate_argnums=(0,))
            self._eval_step = jax.jit(self._eval_step_body)
            self._eval_scan = jax.jit(self._eval_scan_body)
            self._data_sharding = None
            self._kdata_sharding = None

    # ------------------------------------------------------------------
    # host-facing API
    # ------------------------------------------------------------------
    def _put_batch(self, arr, dtype):
        a = np.asarray(arr)
        if a.ndim >= 3:  # [W, B, ...] -> [W*B, ...]
            a = a.reshape(a.shape[0] * a.shape[1], *a.shape[2:])
        a = a.astype(dtype, copy=False)
        if self._data_sharding is not None:
            return jax.device_put(a, self._data_sharding)
        return jnp.asarray(a)

    def example_step_args(self):
        """Zero-filled device args of one train step (for HLO inspection:
        `utils/hlo_stats.collective_bytes(eng._train_step, state, *args)`)."""
        gb = self.cfg.batch_size * max(self.num_shards, 1)
        spec = self.model.spec
        d = self._put_batch(np.zeros((gb, max(spec.num_dense, 0))),
                            np.float32)
        s = self._put_batch(np.zeros((gb, spec.num_sparse)), np.int32)
        y = self._put_batch(np.zeros((gb, 1)), np.float32)
        return d, s, y

    def train_step(self, state: TrainState, dense_x, sparse_ids, labels):
        """One global step. Host arrays may be [W, B, ...] or [W*B, ...]."""
        self._warn_per_step_dsync()
        d = self._put_batch(dense_x, np.float32)
        s = self._put_batch(sparse_ids, np.int32)
        y = self._put_batch(labels, np.float32)
        return self._train_step(state, d, s, y)

    def train_epoch(self, state: TrainState, dense_x, sparse_ids, labels,
                    steps: Optional[int] = None):
        """Run many steps fused in one device call (scanned executor).

        Inputs are flat host arrays covering `steps` global batches
        ([steps*GB, ...]); returns (state, stats) with per-step loss arrays.
        """
        gb = self.cfg.batch_size * max(self.num_shards, 1)
        steps = steps or len(sparse_ids) // gb
        assert steps >= 1, "not enough samples for one step"

        def stack(a, dtype):
            if isinstance(a, jax.Array) and a.ndim >= 2 \
                    and a.shape[0] == steps:
                return a    # already staged on device ([K, GB, ...])
            a = np.asarray(a)[: steps * gb].astype(dtype, copy=False)
            a = a.reshape(steps, gb, *a.shape[1:])
            if self._kdata_sharding is not None:
                return jax.device_put(a, self._kdata_sharding)
            return jnp.asarray(a)

        d = stack(dense_x, np.float32)
        s = stack(sparse_ids, np.int32)
        y = stack(labels, np.float32)
        return self._train_epoch(state, d, s, y)

    def train_epoch_assigned(self, state: TrainState, scheduler,
                             dense_x, sparse_ids, labels, steps: int):
        """Assignment-only scheduled mode: the plain engine fed batches
        composed by the lookahead scheduler's affinity placement
        (csrc/herald_sched.cc), WITHOUT the hot-row cache — isolates the
        scheduling gain in the A/B ladder, mirroring the reference's
        run_hetu vs run_laia comparison at cache-limit 0
        (`examples/ctr/run_laia.py:214-237`). Gradients are identical to
        the baseline up to fp reordering: the global batch SET is
        unchanged, only its split across workers moves (samples land on
        the worker whose recent batches shared their ids, shrinking
        per-worker uniques and exchange traffic on sessionized streams).
        """
        idx_rows = []
        for _ in range(steps):
            r = scheduler.pop()
            if r is None:
                break
            assign, _plans = r
            idx_rows.append(assign.reshape(-1))
        if not idx_rows:
            return state, None
        idx = np.concatenate(idx_rows)
        return self.train_epoch(state, dense_x[idx], sparse_ids[idx],
                                labels[idx], steps=len(idx_rows))

    def predict(self, state: TrainState, dense_x, sparse_ids):
        d = self._put_batch(dense_x, np.float32)
        s = self._put_batch(sparse_ids, np.int32)
        probs, overflow = self._eval_step(state, d, s)
        if int(np.asarray(overflow)) > 0:
            raise RuntimeError(
                "eval exchange overflow: predictions would be computed "
                "on zero-filled embeddings; raise a2a_capacity_factor")
        return probs

    def evaluate(self, state: TrainState, dense_x, sparse_ids, labels,
                 batch: Optional[int] = None) -> Dict[str, float]:
        """Full-dataset eval; mirrors the reference's per-epoch validation
        (`examples/ctr/run_laia.py:266-289`: loss/acc/AUC). The tail is
        padded to a full batch (fixed compiled shape) and its extra
        predictions discarded, so every sample is scored."""
        n = len(sparse_ids)
        if n == 0:
            return {"auc": 0.5, "acc": float("nan")}
        gb = self.cfg.batch_size * max(self.num_shards, 1)
        batch = batch or gb
        if self.num_shards > 1 and batch > gb:
            # the all-to-all exchange capacity is sized for gb; a larger
            # eval batch would overflow it and zero-fill embeddings
            batch = gb
        # scanned blocks of up to T batches: one put + one dispatch +
        # one readback per BLOCK instead of per batch (per-batch eval
        # cost ~3 transport round trips each — minutes per 1M-row epoch
        # eval on tunnel transports). The tail pads by repeating the
        # last sample; padded predictions are discarded below, so every
        # real sample is scored exactly once.
        nb = -(-n // batch)
        T = min(32, nb)
        blocks = -(-nb // T)
        rows = T * batch
        d_all = np.asarray(dense_x, np.float32)
        s_all = np.asarray(sparse_ids, np.int32)
        total = blocks * rows
        if total > n:
            pad = total - n
            d_all = np.concatenate([d_all,
                                    np.repeat(d_all[-1:], pad, axis=0)])
            s_all = np.concatenate([s_all,
                                    np.repeat(s_all[-1:], pad, axis=0)])
        preds = []
        for b in range(blocks):
            dk = d_all[b * rows:(b + 1) * rows].reshape(
                T, batch, *d_all.shape[1:])
            sk = s_all[b * rows:(b + 1) * rows].reshape(
                T, batch, *s_all.shape[1:])
            if self.num_shards > 1:
                dk, sk = jax.device_put(
                    (dk, sk), (self._kdata_sharding,) * 2)
            p, ov = self._eval_scan(state, dk, sk)
            p = np.asarray(p)
            if int(np.asarray(ov)) > 0:
                raise RuntimeError(
                    "eval exchange overflow: predictions would be "
                    "computed on zero-filled embeddings; raise "
                    "a2a_capacity_factor")
            preds.append(p.reshape(-1))
        y_score = np.concatenate(preds)[:n]
        y_true = np.asarray(labels).reshape(-1)[: len(y_score)]
        return {
            "auc": M.auc_score(y_true, y_score),
            "acc": M.accuracy(y_true, y_score),
        }
