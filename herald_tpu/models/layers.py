"""Layers API: composable (init, apply) building blocks.

Reference: `python/hetu/layers/` — BaseLayer subclasses (Linear, Conv2d,
DropOut, BatchNorm, MaxPool2d/AvgPool2d, Relu, Reshape, Concatenate,
Sequence, Identity, SumLayers) whose `__call__` splices initializer
variables + graph ops into the dataflow graph (`layers/linear.py:20-36`).

Functionally rebuilt: a Layer here is a pure pair — `init(rng) -> params`
(a pytree, possibly empty) and `apply(params, x, *, rng=None, train=False)
-> y` — so towers built from layers jit/grad/shard like the hand-written
model functions (`models/base.py mlp_apply`), and the param pytree drops
straight into the engine's TrainState.dense slot. Stateless layers carry
empty params; Dropout is explicit about randomness (a required `rng` when
`train=True`) instead of the reference's implicit per-op RNG state.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional, Sequence as Seq, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


@dataclasses.dataclass(frozen=True)
class Layer:
    """A functional layer: params = init(rng); y = apply(params, x)."""
    init: Callable
    apply: Callable

    def __call__(self, params, x, **kw):
        return self.apply(params, x, **kw)


def _stateless(fn) -> Layer:
    return Layer(init=lambda rng: {},
                 apply=lambda params, x, **kw: fn(x))


def Identity() -> Layer:
    return _stateless(lambda x: x)


def Relu() -> Layer:
    return _stateless(jax.nn.relu)


def Gelu() -> Layer:
    return _stateless(jax.nn.gelu)


def Reshape(shape: Seq[int]) -> Layer:
    return _stateless(lambda x: x.reshape(shape))


def Linear(in_features: int, out_features: int, bias: bool = True,
           activation: Optional[str] = None, stddev: float = 0.01,
           initializer=None) -> Layer:
    """Reference `layers/linear.py`: weight + optional bias + optional
    activation. Reference CTR builders use normal(0.01), matching
    `models/base.mlp_init`; pass stddev=None for Xavier-uniform or an
    `initializer=` from `models/initializers` (the reference feeds the
    (in, out) shape to its initializer, `linear.py:28-29` — same here)."""
    act = {None: None, "relu": jax.nn.relu,
           "gelu": jax.nn.gelu}[activation]

    def init(rng):
        if initializer is not None:
            W = initializer(rng, (in_features, out_features))
        elif stddev is None:   # GenXavierUniform
            from herald_tpu.models.initializers import xavier_uniform
            W = xavier_uniform(rng, (in_features, out_features))
        else:
            W = stddev * jax.random.normal(
                rng, (in_features, out_features), jnp.float32)
        p = {"W": W}
        if bias:
            p["b"] = jnp.zeros((out_features,), jnp.float32)
        return p

    def apply(p, x, **kw):
        y = x @ p["W"]
        if bias:
            y = y + p["b"]
        return act(y) if act else y

    return Layer(init=init, apply=apply)


def Conv2d(in_channels: int, out_channels: int, kernel_size: int,
           stride: int = 1, padding: int = 0,
           activation: Optional[str] = None, stddev: float = 0.1,
           initializer=None) -> Layer:
    """NCHW conv (reference `layers/conv.py` / `ht.conv2d_op`); OIHW
    weights, so `models/initializers` fan math applies directly."""
    act = {None: None, "relu": jax.nn.relu}[activation]

    def init(rng):
        k = kernel_size
        shape = (out_channels, in_channels, k, k)
        if initializer is not None:
            return {"W": initializer(rng, shape)}
        return {"W": stddev * jax.random.normal(rng, shape, jnp.float32)}

    def apply(p, x, **kw):
        y = lax.conv_general_dilated(
            x, p["W"], window_strides=(stride, stride),
            padding=[(padding, padding)] * 2,
            dimension_numbers=("NCHW", "OIHW", "NCHW"))
        return act(y) if act else y

    return Layer(init=init, apply=apply)


def _pool(reducer, init_val, kernel_size, stride, padding, avg=False):
    def fn(x):  # NCHW
        k, s, p = kernel_size, stride, padding
        y = lax.reduce_window(
            x, init_val, reducer, window_dimensions=(1, 1, k, k),
            window_strides=(1, 1, s, s),
            padding=[(0, 0), (0, 0), (p, p), (p, p)])
        return y / (k * k) if avg else y
    return _stateless(fn)


def MaxPool2d(kernel_size: int, stride: int, padding: int = 0) -> Layer:
    return _pool(lax.max, -jnp.inf, kernel_size, stride, padding)


def AvgPool2d(kernel_size: int, stride: int, padding: int = 0) -> Layer:
    return _pool(lax.add, 0.0, kernel_size, stride, padding, avg=True)


def BatchNorm(num_channels: int, eps: float = 1e-5) -> Layer:
    """Per-batch normalization over (N, H, W) of NCHW, learnable
    scale/bias (reference `layers/normalization.py` — its
    batch_normalization_op likewise normalizes with batch statistics)."""
    def init(rng):
        return {"scale": jnp.ones((1, num_channels, 1, 1), jnp.float32),
                "bias": jnp.zeros((1, num_channels, 1, 1), jnp.float32)}

    def apply(p, x, **kw):
        mean = x.mean(axis=(0, 2, 3), keepdims=True)
        var = x.var(axis=(0, 2, 3), keepdims=True)
        return (x - mean) * lax.rsqrt(var + eps) * p["scale"] + p["bias"]

    return Layer(init=init, apply=apply)


def DropOut(p: float = 0.5) -> Layer:
    """Explicit-rng dropout: identity at eval; requires `rng` when
    train=True (reference `layers/dropout.py` keeps the RNG implicit)."""
    def apply(params, x, *, rng=None, train=False, **kw):
        if not train or p == 0.0:
            return x
        assert rng is not None, "DropOut(train=True) needs rng="
        keep = jax.random.bernoulli(rng, 1.0 - p, x.shape)
        return jnp.where(keep, x / (1.0 - p), 0.0)

    return Layer(init=lambda rng: {}, apply=apply)


def Concatenate(axis: int = -1) -> Layer:
    """Applies to a SEQUENCE of inputs (reference `layers/concatenate.py`
    Concatenate)."""
    return Layer(init=lambda rng: {},
                 apply=lambda params, xs, **kw: jnp.concatenate(xs, axis))


def _sub_rngs(kw, n):
    """Pop the combinator's rng and derive one independent key per
    sub-layer — two DropOuts in one Sequence must not share a mask."""
    rng = kw.pop("rng", None)
    if rng is None:
        return [None] * n
    return list(jax.random.split(rng, n))


def ConcatenateLayers(layers: Seq[Layer], axis: int = -1) -> Layer:
    """Run each layer on the same input, concat outputs (reference
    ConcatenateLayers)."""
    def init(rng):
        keys = jax.random.split(rng, len(layers))
        return [l.init(k) for l, k in zip(layers, keys)]

    def apply(params, x, **kw):
        rngs = _sub_rngs(kw, len(layers))
        return jnp.concatenate(
            [l.apply(p, x, rng=k, **kw)
             for l, p, k in zip(layers, params, rngs)], axis)

    return Layer(init=init, apply=apply)


def SumLayers(layers: Seq[Layer]) -> Layer:
    """Run each layer on the same input, sum outputs (reference
    `layers/sum.py` SumLayers)."""
    def init(rng):
        keys = jax.random.split(rng, len(layers))
        return [l.init(k) for l, k in zip(layers, keys)]

    def apply(params, x, **kw):
        rngs = _sub_rngs(kw, len(layers))
        out = None
        for l, p, k in zip(layers, params, rngs):
            y = l.apply(p, x, rng=k, **kw)
            out = y if out is None else out + y
        return out

    return Layer(init=init, apply=apply)


def Sequence(*layers: Layer) -> Layer:
    """Chain layers (reference `layers/sequence.py`)."""
    def init(rng):
        keys = jax.random.split(rng, len(layers))
        return [l.init(k) for l, k in zip(layers, keys)]

    def apply(params, x, **kw):
        rngs = _sub_rngs(kw, len(layers))
        for l, p, k in zip(layers, params, rngs):
            x = l.apply(p, x, rng=k, **kw)
        return x

    return Layer(init=init, apply=apply)
