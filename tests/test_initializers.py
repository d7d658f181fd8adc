"""Initializer library vs reference semantics
(`python/hetu/initializers.py`): fan math, truncation bounds,
distribution moments, Gen* factories, layers wiring."""

import numpy as np

import jax
import jax.numpy as jnp

from herald_tpu.models import initializers as I
from herald_tpu.models import layers as L


def test_xavier_limits_match_reference_formula():
    """XavierUniform = general(3.0, 'avg'); He = (6.0, 'fan_in');
    Lecun = (3.0, 'fan_in') — limits per initializers.py:94-127, with
    the reference fan convention (shape[0]=out, shape[1]=in,
    hw_scale=prod(shape[2:]))."""
    rng = jax.random.PRNGKey(0)
    shape = (64, 256)
    w = I.xavier_uniform(rng, shape)
    lim = np.sqrt(3.0 / ((64 + 256) / 2.0))
    a = np.asarray(w)
    assert a.max() <= lim and a.min() >= -lim
    assert a.max() > 0.9 * lim        # actually fills the range

    w = I.he_uniform(rng, shape)      # fan_in = shape[1] = 256
    lim = np.sqrt(6.0 / 256)
    a = np.asarray(w)
    assert a.max() <= lim and a.min() >= -lim

    # conv OIHW: hw_scale multiplies both fans
    w = I.lecun_uniform(rng, (8, 4, 3, 3))
    lim = np.sqrt(3.0 / (4 * 9))
    a = np.asarray(w)
    assert a.max() <= lim and a.min() >= -lim


def test_truncated_normal_bounds_and_moments():
    rng = jax.random.PRNGKey(1)
    a = np.asarray(I.truncated_normal(rng, (100_000,), mean=0.5,
                                      stddev=0.1))
    # truncation at +/- 2 sigma around the mean (initializers.py:204-205)
    assert a.max() <= 0.5 + 2 * 0.1 + 1e-6
    assert a.min() >= 0.5 - 2 * 0.1 - 1e-6
    assert abs(a.mean() - 0.5) < 5e-3


def test_basic_and_gen_factories():
    rng = jax.random.PRNGKey(2)
    np.testing.assert_array_equal(np.asarray(I.zeros(rng, (3, 2))), 0)
    np.testing.assert_array_equal(np.asarray(I.ones(rng, (3,))), 1)
    np.testing.assert_array_equal(
        np.asarray(I.constant(rng, (2, 2), fill_value=7.0)), 7.0)
    # Gen* factory == direct call with the same key
    f = I.GenNormal(mean=1.0, stddev=0.25)
    np.testing.assert_array_equal(
        np.asarray(f(rng, (4, 4))),
        np.asarray(I.random_normal(rng, (4, 4), mean=1.0, stddev=0.25)))
    g = I.GenGeneralXavierUniform(gain=2.0, mode="fan_out")
    np.testing.assert_array_equal(
        np.asarray(g(rng, (8, 4))),
        np.asarray(I.general_xavier_uniform(rng, (8, 4), 2.0, "fan_out")))


def test_layers_take_initializers():
    """layers.Linear(initializer=GenXavierUniform()) reproduces the
    reference Linear default (`layers/linear.py:14`)."""
    lin = L.Linear(16, 8, bias=False, initializer=I.GenXavierUniform())
    params = lin.init(jax.random.PRNGKey(3))
    lim = np.sqrt(3.0 / ((16 + 8) / 2.0))
    a = np.asarray(params["W"])
    assert a.shape == (16, 8) and a.max() <= lim and a.min() >= -lim
    # stddev=None fallback is the same distribution family
    lin2 = L.Linear(16, 8, bias=False, stddev=None)
    a2 = np.asarray(lin2.init(jax.random.PRNGKey(3))["W"])
    np.testing.assert_array_equal(a, a2)

    conv = L.Conv2d(3, 8, kernel_size=3, initializer=I.GenHeNormal())
    w = np.asarray(conv.init(jax.random.PRNGKey(4))["W"])
    assert w.shape == (8, 3, 3, 3)
    assert abs(w.std() - np.sqrt(2.0 / (3 * 9))) < 0.02
