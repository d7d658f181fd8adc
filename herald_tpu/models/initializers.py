"""Initializer library (reference `python/hetu/initializers.py`).

The reference ships BaseInit subclasses with three backends (GPU kernel,
DNNL/numpy CPU, `init_on_ps` RPC) and `Gen*` factory helpers that layers
take as arguments (`layers/linear.py:14` defaults to GenXavierUniform).
Here an initializer is one pure function `f(rng, shape, dtype) -> array`
— the PS backend is unnecessary (sharded init is `jax.jit` with
`out_shardings`, see `train/engine.py init_state`) and JAX's RNG replaces
the seed plumbing. `Gen*` factories are kept with the reference names so
layer code reads the same.

Fan convention follows the reference exactly (`initializers.py:94-111`):
fan_in = prod(shape[2:]) * shape[1], fan_out = prod(shape[2:]) * shape[0]
— i.e. shape[0] is the OUTPUT dim (conv OIHW / torch Linear layout).
Note `models/layers.Linear` stores W as (in, out); pass `initializer=`
there and the helper accounts for it.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp


def zeros(rng, shape, dtype=jnp.float32):
    del rng
    return jnp.zeros(shape, dtype)


def ones(rng, shape, dtype=jnp.float32):
    del rng
    return jnp.ones(shape, dtype)


def constant(rng, shape, fill_value=0.0, dtype=jnp.float32):
    del rng
    return jnp.full(shape, fill_value, dtype)


def random_uniform(rng, shape, minval=-1.0, maxval=1.0, dtype=jnp.float32):
    return jax.random.uniform(rng, shape, dtype, minval, maxval)


def random_normal(rng, shape, mean=0.0, stddev=1.0, dtype=jnp.float32):
    return mean + stddev * jax.random.normal(rng, shape, dtype)


def truncated_normal(rng, shape, mean=0.0, stddev=1.0, dtype=jnp.float32):
    """Truncated at +/- 2 sigma like the reference
    (`initializers.py:204-205`: truncnorm(-2.0, 2.0))."""
    return mean + stddev * jax.random.truncated_normal(
        rng, -2.0, 2.0, shape, dtype)


def _fan_factor(shape, mode):
    assert mode in ("fan_in", "fan_out", "avg"), f"Mode {mode} not valid."
    assert len(shape) >= 2, "General xavier requires >= 2D shapes."
    hw_scale = 1 if len(shape) == 2 else int(np.prod(shape[2:]))
    fan_in = hw_scale * shape[1]
    fan_out = hw_scale * shape[0]
    return {"fan_in": fan_in, "fan_out": fan_out,
            "avg": (fan_in + fan_out) / 2.0}[mode]


def general_xavier_uniform(rng, shape, gain, mode, dtype=jnp.float32):
    limit = float(np.sqrt(gain / _fan_factor(shape, mode)))
    return jax.random.uniform(rng, shape, dtype, -limit, limit)


def general_xavier_normal(rng, shape, gain, mode, dtype=jnp.float32):
    std = float(np.sqrt(gain / _fan_factor(shape, mode)))
    return std * jax.random.normal(rng, shape, dtype)


def xavier_uniform(rng, shape, dtype=jnp.float32):
    return general_xavier_uniform(rng, shape, 3.0, "avg", dtype)


def xavier_normal(rng, shape, dtype=jnp.float32):
    return general_xavier_normal(rng, shape, 1.0, "avg", dtype)


def he_uniform(rng, shape, dtype=jnp.float32):
    return general_xavier_uniform(rng, shape, 6.0, "fan_in", dtype)


def he_normal(rng, shape, dtype=jnp.float32):
    return general_xavier_normal(rng, shape, 2.0, "fan_in", dtype)


def lecun_uniform(rng, shape, dtype=jnp.float32):
    return general_xavier_uniform(rng, shape, 3.0, "fan_in", dtype)


def lecun_normal(rng, shape, dtype=jnp.float32):
    return general_xavier_normal(rng, shape, 1.0, "fan_in", dtype)


# ---- Gen* factories (reference initializers.py:320-373): shape-less ----
def _gen(fn, **kw):
    def init(rng, shape, dtype=jnp.float32):
        return fn(rng, shape, dtype=dtype, **kw)
    return init


def GenZeros():
    return _gen(zeros)


def GenOnes():
    return _gen(ones)


def GenConstant(fill_value=0.0):
    return _gen(constant, fill_value=fill_value)


def GenUniform(minval=-1.0, maxval=1.0):
    return _gen(random_uniform, minval=minval, maxval=maxval)


def GenNormal(mean=0.0, stddev=1.0):
    return _gen(random_normal, mean=mean, stddev=stddev)


def GenTruncatedNormal(mean=0.0, stddev=1.0):
    return _gen(truncated_normal, mean=mean, stddev=stddev)


def GenGeneralXavierUniform(gain, mode):
    return _gen(general_xavier_uniform, gain=gain, mode=mode)


def GenGeneralXavierNormal(gain, mode):
    return _gen(general_xavier_normal, gain=gain, mode=mode)


def GenXavierUniform():
    return _gen(xavier_uniform)


def GenXavierNormal():
    return _gen(xavier_normal)


def GenHeUniform():
    return _gen(he_uniform)


def GenHeNormal():
    return _gen(he_normal)


def GenLecunUniform():
    return _gen(lecun_uniform)


def GenLecunNormal():
    return _gen(lecun_normal)
