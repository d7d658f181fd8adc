"""Optimizers, usable both densely and row-wise on embedding rows.

Mirrors the reference's two optimizer sites with one implementation:
- graph-level optimizers (`python/hetu/optimizer.py`: SGD / Momentum /
  Nesterov / AdaGrad / Adam / AdamW / LAMB, incl. sparse variants), and
- server-side optimizers applied to embedding rows
  (`ps-lite/include/ps/server/optimizer.h:25-240` ApplyDense / ApplySparse /
  ApplyCache).

`apply_rows` updates a gathered set of rows [U, D] with their gathered slot
states — the TPU analog of ApplySparse, where the engine owns gather/scatter
on the row-sharded table. ApplyCache's per-row update-count scaling is the
optional `counts` argument.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class Optimizer:
    name: str
    lr: float = 0.01
    momentum: float = 0.9
    beta1: float = 0.9
    beta2: float = 0.999
    eps: float = 1e-7
    weight_decay: float = 0.0

    # ------------------------------------------------------------------
    @property
    def slot_names(self) -> Tuple[str, ...]:
        return {
            "sgd": (),
            "momentum": ("velocity",),
            "nesterov": ("velocity",),
            "adagrad": ("accum",),
            "adam": ("m", "v"),
            "adamw": ("m", "v"),
            "lamb": ("m", "v"),
        }[self.name]

    def init_slots(self, param: jnp.ndarray) -> Dict[str, jnp.ndarray]:
        return {s: jnp.zeros_like(param) for s in self.slot_names}

    # ------------------------------------------------------------------
    def apply_rows(
        self,
        rows: jnp.ndarray,              # [U, D] current values
        grads: jnp.ndarray,             # [U, D] summed grads for these rows
        slots: Dict[str, jnp.ndarray],  # each [U, D]
        step: jnp.ndarray,              # scalar int, 1-based
        lr: Optional[float] = None,
        counts: Optional[jnp.ndarray] = None,   # [U] update counts (ApplyCache)
        mask: Optional[jnp.ndarray] = None,     # [U] bool, False = padding row
    ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
        """Return (new_rows, new_slots). Padding rows pass through unchanged."""
        lr = self.lr if lr is None else lr
        g = grads
        if counts is not None:
            # ApplyCache semantics (`optimizer.h`): scale by per-row counts
            g = g / jnp.maximum(counts, 1).astype(g.dtype)[:, None]
        if self.weight_decay and self.name not in ("adamw", "lamb"):
            # adamw/lamb use DECOUPLED decay (added to the update direction
            # below, like _adamw_dense/_lamb_dense) — coupling it here too
            # would regularize twice
            g = g + self.weight_decay * rows

        new_slots = dict(slots)
        if self.name == "sgd":
            upd = lr * g
        elif self.name in ("momentum", "nesterov"):
            vel = self.momentum * slots["velocity"] + g
            if self.name == "nesterov":
                upd = lr * (g + self.momentum * vel)
            else:
                upd = lr * vel
            new_slots["velocity"] = vel
        elif self.name == "adagrad":
            acc = slots["accum"] + g * g
            upd = lr * g / (jnp.sqrt(acc) + self.eps)
            new_slots["accum"] = acc
        elif self.name in ("adam", "adamw", "lamb"):
            m = self.beta1 * slots["m"] + (1 - self.beta1) * g
            v = self.beta2 * slots["v"] + (1 - self.beta2) * g * g
            t = step.astype(jnp.float32)
            mhat = m / (1 - self.beta1 ** t)
            vhat = v / (1 - self.beta2 ** t)
            direction = mhat / (jnp.sqrt(vhat) + self.eps)
            if self.name == "adamw":
                direction = direction + self.weight_decay * rows
            if self.name == "lamb":
                direction = direction + self.weight_decay * rows
                # row-wise trust ratio (per embedding row)
                wn = jnp.linalg.norm(rows, axis=-1, keepdims=True)
                dn = jnp.linalg.norm(direction, axis=-1, keepdims=True)
                trust = jnp.where((wn > 0) & (dn > 0), wn / (dn + 1e-12), 1.0)
                direction = trust * direction
            upd = lr * direction
            new_slots["m"], new_slots["v"] = m, v
        else:
            raise ValueError(f"unknown optimizer {self.name}")

        if mask is not None:
            fmask = mask.astype(rows.dtype)
            while fmask.ndim < rows.ndim:
                fmask = fmask[..., None]
            upd = upd * fmask
            for k in new_slots:
                new_slots[k] = jnp.where(
                    fmask > 0, new_slots[k], slots[k])
        return rows - upd, new_slots

    # ------------------------------------------------------------------
    def apply_dense(self, params, grads, slots, step, lr=None):
        """Tree-wide dense update; params/grads/slots are matching pytrees.

        slots: pytree with same structure as params, each leaf a dict of
        slot arrays.
        """
        flat_p, treedef = jax.tree_util.tree_flatten(params)
        flat_g = treedef.flatten_up_to(grads)
        flat_s = treedef.flatten_up_to(slots)
        new_p, new_s = [], []
        for p, g, s in zip(flat_p, flat_g, flat_s):
            if self.name == "lamb":
                # full-tensor trust ratio for dense params
                np_, ns = self._lamb_dense(p, g, s, step, lr)
            else:
                np_, ns = self.apply_rows(p, g, s, step, lr)
            new_p.append(np_)
            new_s.append(ns)
        return (jax.tree_util.tree_unflatten(treedef, new_p),
                jax.tree_util.tree_unflatten(treedef, new_s))

    def _lamb_dense(self, p, g, slots, step, lr=None):
        lr = self.lr if lr is None else lr
        m = self.beta1 * slots["m"] + (1 - self.beta1) * g
        v = self.beta2 * slots["v"] + (1 - self.beta2) * g * g
        t = step.astype(jnp.float32)
        mhat = m / (1 - self.beta1 ** t)
        vhat = v / (1 - self.beta2 ** t)
        direction = mhat / (jnp.sqrt(vhat) + self.eps) + self.weight_decay * p
        wn = jnp.linalg.norm(p)
        dn = jnp.linalg.norm(direction)
        trust = jnp.where((wn > 0) & (dn > 0), wn / (dn + 1e-12), 1.0)
        return p - lr * trust * direction, {"m": m, "v": v}


OPTIMIZERS = ("sgd", "momentum", "nesterov", "adagrad", "adam", "adamw",
              "lamb")


def get_optimizer(name: str, lr: float = 0.01, **kw) -> Optimizer:
    name = name.lower()
    if name not in OPTIMIZERS:
        raise ValueError(f"unknown optimizer {name!r}; have {OPTIMIZERS}")
    return Optimizer(name=name, lr=lr, **kw)
