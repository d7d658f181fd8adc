"""FAE baseline: hot/cold split embeddings.

Reference: `examples/ctr/models/fae_*.py` + `run_laia_fae.py` — the
competing approach Herald A/Bs against. The top ~1% most frequent IDs
("hot", `num_hot_emb = 337626` at `fae_wdl_criteo.py:7`) live in a dense
device-resident matrix trained synchronously; cold IDs go through the
normal embedding path.

TPU re-design: the hot table is a **replicated** [H, W] array updated with
psum-reduced sparse gradients (replacing the reference's one-hot matmul,
which would materialize a [B, H] one-hot — 345 MB at reference scale); the
cold path reuses the row-sharded all-to-all exchange. Unlike the reference
(sum-pooled towers only), any registered model tower works: the engine
assembles the full [B, F, W] embedding tensor from both paths.

Hot-ID selection is profiled from the training ID stream at startup
(`build_hot_lut`), mirroring FAE's offline hot-feature profiling.
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from herald_tpu.config import HeraldConfig
from herald_tpu.models.base import ModelDef, bce_with_logits
from herald_tpu.parallel import exchange as ex
from herald_tpu.train.engine import Engine, TrainState


def build_hot_lut(sparse_ids: np.ndarray, num_rows: int,
                  hot_rate: float = 0.01,
                  num_hot: Optional[int] = None
                  ) -> Tuple[np.ndarray, np.ndarray]:
    """Profile ID frequencies; return (lut, hot_ids).

    lut[id] = hot index in [0, H) for hot ids, -1 for cold.
    """
    if num_hot is None:
        num_hot = max(1, int(num_rows * hot_rate))
    ids, counts = np.unique(sparse_ids.reshape(-1), return_counts=True)
    order = np.argsort(-counts, kind="stable")
    hot_ids = ids[order[:num_hot]]
    lut = np.full(num_rows, -1, np.int32)
    lut[hot_ids] = np.arange(len(hot_ids), dtype=np.int32)
    return lut, hot_ids


class FaeTrainState(NamedTuple):
    table: jnp.ndarray                  # cold table (row-sharded)
    table_slots: Dict[str, jnp.ndarray]
    dense: Dict[str, jnp.ndarray]
    dense_slots: Dict[str, Dict[str, jnp.ndarray]]
    step: jnp.ndarray
    hot_table: jnp.ndarray              # [H, W] replicated
    hot_slots: Dict[str, jnp.ndarray]


class FaeEngine(Engine):
    def __init__(self, cfg: HeraldConfig, model: Optional[ModelDef] = None,
                 mesh=None, table_rows: Optional[int] = None,
                 hot_rate: float = 0.01, num_hot: Optional[int] = None):
        super().__init__(cfg, model=model, mesh=mesh, table_rows=table_rows)
        self.num_hot = num_hot or max(1, int(self.num_rows * hot_rate))
        self._build_fae_steps()

    def init_fae_state(self, seed: Optional[int] = None) -> FaeTrainState:
        base = super().init_state(seed)
        if seed is None:
            seed = self.cfg.seed        # same fallback as the base state
        key = jax.random.PRNGKey(seed + 7)
        hot = 0.01 * jax.random.normal(key, (self.num_hot, self.width),
                                       jnp.float32)
        hot = hot.astype(self.cfg.table_dtype)
        # float32: apply_rows computes slots in f32 — an initial
        # table-dtype slot would change dtype after step 1 and retrace
        hot_slots = {k: jnp.zeros((self.num_hot, self.width), jnp.float32)
                     for k in self.embed_opt.slot_names}
        if self.num_shards > 1:
            rep = NamedSharding(self.mesh, P())
            hot = jax.device_put(hot, rep)
            hot_slots = jax.device_put(hot_slots, rep)
        return FaeTrainState(*base, hot_table=hot, hot_slots=hot_slots)

    # ------------------------------------------------------------------
    def _fae_step_body(self, state: FaeTrainState, dense_x, ids, hot_idx,
                       labels):
        """ids: cold ids with -1 where hot; hot_idx: [B,F] hot index or -1."""
        B, F = ids.shape
        step = state.step + 1
        H = self.num_hot

        # cold path (reuses the base exchange; -1 entries are padding)
        cold_emb, uniq, inv, route, overflow = self._forward_embeddings(
            state.table, ids)
        # hot path: replicated gather
        safe_hot = jnp.where(hot_idx >= 0, hot_idx, H + 1)
        hot_emb = state.hot_table.at[safe_hot.reshape(-1)].get(
            mode="fill", fill_value=0).reshape(B, F, self.width)
        is_hot = (hot_idx >= 0)[..., None]
        emb = jnp.where(is_hot, hot_emb.astype(jnp.float32),
                        cold_emb.astype(jnp.float32))

        inv_shards = 1.0 / max(self.num_shards, 1)

        def loss_fn(dense_params, emb):
            logits = self.model.apply(dense_params, emb, dense_x)
            return bce_with_logits(logits, labels) * inv_shards

        loss, (dgrads, emb_grad) = jax.value_and_grad(
            loss_fn, argnums=(0, 1))(state.dense, emb)
        if self.num_shards > 1:
            loss = jax.lax.psum(loss, self.axis)
            # dense-sync relaxation applies at group granularity only here
            # (FaeEngine dispatches per step, so every step is a jit
            # boundary and gets the boundary model average below)
            dgrads = self._reduce_dense_grads(dgrads)
            overflow = jax.lax.psum(overflow, self.axis)
        dense, dense_slots = self.dense_opt.apply_dense(
            state.dense, dgrads, state.dense_slots, step,
            lr=self._lr_fn(step))

        cold_grad = jnp.where(is_hot, 0.0, emb_grad)
        hot_grad = jnp.where(is_hot, emb_grad, 0.0)

        table, table_slots = self._apply_sparse_grads(
            state.table, state.table_slots, step, uniq, inv, route,
            cold_grad)

        # hot update: segment-sum by hot index, psum across replicas,
        # identical replicated row update (reference: dense W5 grads over
        # NCCL; here only touched rows move)
        flat_hot = jnp.where(hot_idx >= 0, hot_idx, H).reshape(-1)
        g_hot = jax.ops.segment_sum(
            hot_grad.reshape(-1, self.width), flat_hot,
            num_segments=H + 1)[:H]
        if self.num_shards > 1:
            g_hot = jax.lax.psum(g_hot, self.axis)
        hot_rows, hot_slots = self.embed_opt.apply_rows(
            state.hot_table.astype(jnp.float32),
            g_hot, state.hot_slots, step, lr=self._elr_fn(step))
        new_state = FaeTrainState(
            table=table, table_slots=table_slots, dense=dense,
            dense_slots=dense_slots, step=step,
            hot_table=hot_rows.astype(state.hot_table.dtype),
            hot_slots=hot_slots)
        return new_state, {"loss": loss, "overflow": overflow}

    def _fae_eval_body(self, state: FaeTrainState, dense_x, ids, hot_idx):
        B, F = ids.shape
        H = self.num_hot
        cold_emb, _, _, _, _ = self._forward_embeddings(state.table, ids)
        safe_hot = jnp.where(hot_idx >= 0, hot_idx, H + 1)
        hot_emb = state.hot_table.at[safe_hot.reshape(-1)].get(
            mode="fill", fill_value=0).reshape(B, F, self.width)
        is_hot = (hot_idx >= 0)[..., None]
        emb = jnp.where(is_hot, hot_emb.astype(jnp.float32),
                        cold_emb.astype(jnp.float32))
        logits = self.model.apply(state.dense, emb, dense_x)
        return jax.nn.sigmoid(logits)

    # ------------------------------------------------------------------
    def _build_fae_steps(self):
        if self.num_shards > 1:
            ax = self.axis
            dense_tree = jax.eval_shape(
                lambda k: self.model.init_dense(k, self.cfg.embedding_dim),
                jax.random.PRNGKey(0))
            specs = FaeTrainState(
                table=P(ax, None),
                table_slots={k: P(ax, None)
                             for k in self.embed_opt.slot_names},
                dense=jax.tree.map(lambda _: P(), dense_tree),
                dense_slots=jax.tree.map(
                    lambda _: {k: P() for k in self.dense_opt.slot_names},
                    dense_tree),
                step=P(),
                hot_table=P(),
                hot_slots={k: P() for k in self.embed_opt.slot_names},
            )
            dsp = P(ax)
            stats = {"loss": P(), "overflow": P()}
            def step_body(state, *xs):
                state, st = self._fae_step_body(state, *xs)
                if self._dsync_on:
                    state = self._sync_dense(state)
                return state, st

            self._fae_step = jax.jit(jax.shard_map(
                step_body, mesh=self.mesh,
                in_specs=(specs,) + (dsp,) * 4,
                out_specs=(specs, stats), check_vma=False),
                donate_argnums=(0,))
            self._fae_eval = jax.jit(jax.shard_map(
                self._fae_eval_body, mesh=self.mesh,
                in_specs=(specs,) + (dsp,) * 3, out_specs=dsp,
                check_vma=False))
        else:
            self._fae_step = jax.jit(self._fae_step_body,
                                     donate_argnums=(0,))
            self._fae_eval = jax.jit(self._fae_eval_body)

    # ------------------------------------------------------------------
    def split_batch(self, lut: np.ndarray, sparse_ids: np.ndarray):
        """Host split: (cold_ids with -1 at hot positions, hot_idx)."""
        hot_idx = lut[sparse_ids]
        cold = np.where(hot_idx >= 0, -1, sparse_ids)
        return cold.astype(np.int32), hot_idx.astype(np.int32)

    def train_step_fae(self, state, lut, dense_x, sparse_ids, labels):
        self._warn_per_step_dsync()
        cold, hot_idx = self.split_batch(lut, np.asarray(sparse_ids))
        d = self._put_batch(dense_x, np.float32)
        c = self._put_batch(cold, np.int32)
        h = self._put_batch(hot_idx, np.int32)
        y = self._put_batch(labels, np.float32)
        return self._fae_step(state, d, c, h, y)

    def evaluate_fae(self, state, lut, dense_x, sparse_ids, labels,
                     batch: Optional[int] = None):
        from herald_tpu.utils import metrics as M
        n = len(sparse_ids)
        gb = self.cfg.batch_size * max(self.num_shards, 1)
        batch = batch or gb
        preds = []
        for i in range(0, n - batch + 1, batch):
            cold, hot_idx = self.split_batch(
                lut, np.asarray(sparse_ids[i:i + batch]))
            p = self._fae_eval(
                state, self._put_batch(dense_x[i:i + batch], np.float32),
                self._put_batch(cold, np.int32),
                self._put_batch(hot_idx, np.int32))
            preds.append(np.asarray(p))
        y_score = np.concatenate(preds) if preds else np.zeros(0)
        y_true = np.asarray(labels).reshape(-1)[: len(y_score)]
        return {"auc": M.auc_score(y_true, y_score),
                "acc": M.accuracy(y_true, y_score)}
