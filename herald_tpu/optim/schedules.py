"""Learning-rate schedulers.

Mirrors `python/hetu/lr_scheduler.py` (Fixed / Step / MultiStep /
Exponential / ReduceOnPlateau) in two forms:

- jit-traceable `fn(step) -> lr` factories for the schedules that depend
  only on the step counter (usable inside the compiled train step);
- a host-side `ReduceOnPlateau` (depends on observed metrics, so it runs
  between steps like the reference).
"""

from __future__ import annotations

from typing import Callable, Sequence

import jax.numpy as jnp


def fixed(lr: float) -> Callable:
    return lambda step: jnp.asarray(lr, jnp.float32)


def step_decay(lr: float, step_size: int, gamma: float = 0.1,
               ending: float = 1e-8) -> Callable:
    def f(step):
        k = jnp.floor((step - 1) / step_size)
        return jnp.maximum(lr * gamma ** k, ending).astype(jnp.float32)
    return f


def multistep(lr: float, milestones: Sequence[int],
              gamma: float = 0.1) -> Callable:
    ms = jnp.asarray(sorted(milestones))

    def f(step):
        k = jnp.sum(step > ms)
        return (lr * gamma ** k).astype(jnp.float32)
    return f


def exponential(lr: float, gamma: float = 0.9,
                ending: float = 1e-8) -> Callable:
    def f(step):
        return jnp.maximum(lr * gamma ** (step - 1),
                           ending).astype(jnp.float32)
    return f


def cosine(lr: float, total_steps: int, min_lr: float = 0.0) -> Callable:
    def f(step):
        t = jnp.clip((step - 1) / max(total_steps - 1, 1), 0.0, 1.0)
        return (min_lr + 0.5 * (lr - min_lr)
                * (1 + jnp.cos(jnp.pi * t))).astype(jnp.float32)
    return f


SCHEDULES = {
    "constant": lambda lr, **kw: fixed(lr),
    "step": lambda lr, **kw: step_decay(lr, kw.get("step_size", 1000),
                                        kw.get("gamma", 0.1)),
    "multistep": lambda lr, **kw: multistep(lr, kw.get("milestones", [])),
    "exp": lambda lr, **kw: exponential(lr, kw.get("gamma", 0.9)),
    "cosine": lambda lr, **kw: cosine(lr, kw.get("total_steps", 10000)),
}


def get_schedule(name: str, lr: float, **kw) -> Callable:
    if name not in SCHEDULES:
        raise ValueError(f"unknown schedule {name!r}; have "
                         f"{sorted(SCHEDULES)}")
    return SCHEDULES[name](lr, **kw)


class ReduceOnPlateau:
    """Host-side plateau scheduler (reference ReduceOnPlateauScheduler,
    `lr_scheduler.py:83-130`)."""

    def __init__(self, lr: float, mode: str = "min", factor: float = 0.1,
                 patience: int = 10, threshold: float = 1e-4,
                 threshold_mode: str = "rel", cooldown: int = 0,
                 ending: float = 1e-8):
        assert mode in ("min", "max") and threshold_mode in ("rel", "abs")
        self.lr = lr
        self.mode = mode
        self.factor = factor
        self.patience = patience
        self.threshold = threshold
        self.threshold_mode = threshold_mode
        self.cooldown = cooldown
        self.ending = ending
        self.best = None
        self.bad_count = 0
        self.cooldown_left = 0

    def _better(self, value) -> bool:
        if self.best is None:
            return True
        t = self.threshold
        if self.mode == "min":
            bound = self.best * (1 - t) if self.threshold_mode == "rel" \
                else self.best - t
            return value < bound
        bound = self.best * (1 + t) if self.threshold_mode == "rel" \
            else self.best + t
        return value > bound

    def step(self, value) -> float:
        if self._better(value):
            self.best = value
            self.bad_count = 0
        elif self.cooldown_left > 0:
            self.cooldown_left -= 1
        else:
            self.bad_count += 1
            if self.bad_count > self.patience:
                self.lr = max(self.lr * self.factor, self.ending)
                self.bad_count = 0
                self.cooldown_left = self.cooldown
        return self.lr

    def get(self) -> float:
        return self.lr
