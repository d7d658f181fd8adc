"""Layers API (models/layers.py) vs the reference's `python/hetu/layers/`
semantics, with the hand-written towers as oracles."""

import numpy as np

import jax
import jax.numpy as jnp

from herald_tpu.models import layers as L
from herald_tpu.models.base import mlp_apply, mlp_init


def test_sequence_linear_matches_mlp_helpers():
    """A Sequence of Linear layers reproduces the hand-written MLP that
    the model builders use (same init distribution given the same keys)."""
    tower = L.Sequence(
        L.Linear(13, 256, bias=False, activation="relu"),
        L.Linear(256, 256, bias=False, activation="relu"),
        L.Linear(256, 1, bias=False),
    )
    rng = jax.random.PRNGKey(0)
    params = tower.init(rng)
    x = jax.random.normal(jax.random.PRNGKey(1), (8, 13))

    # oracle: mlp_init/mlp_apply with the same per-layer keys
    keys = jax.random.split(rng, 3)
    ref_params = {}
    for i, (m, n) in enumerate(zip([13, 256, 256], [256, 256, 1])):
        ref_params[f"W{i + 1}"] = 0.01 * jax.random.normal(
            keys[i], (m, n), jnp.float32)
    ref = mlp_apply(ref_params, x, 3)
    out = tower.apply(params, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-6, atol=1e-7)


def test_conv_pool_batchnorm_shapes():
    """CNN blocks (the reference layers the CTR models never touch but
    `layers/__init__.py` exports): shape and normalization contracts."""
    net = L.Sequence(
        L.Conv2d(3, 8, kernel_size=3, stride=1, padding=1,
                 activation="relu"),
        L.BatchNorm(8),
        L.MaxPool2d(kernel_size=2, stride=2),
        L.Conv2d(8, 4, kernel_size=3, stride=1, padding=1),
        L.AvgPool2d(kernel_size=2, stride=2),
        L.Reshape((2, -1)),
        L.Linear(4 * 8 * 8, 10),
    )
    params = net.init(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 3, 32, 32))
    y = jax.jit(net.apply)(params, x)
    assert y.shape == (2, 10)
    # batchnorm really normalizes: per-channel mean ~0 / var ~1 pre-affine
    bn = L.BatchNorm(3)
    z = bn.apply(bn.init(jax.random.PRNGKey(2)), x)
    np.testing.assert_allclose(np.asarray(z.mean(axis=(0, 2, 3))), 0,
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(z.var(axis=(0, 2, 3))), 1,
                               atol=1e-3)


def test_dropout_and_combinators():
    x = jnp.ones((4, 6))
    do = L.DropOut(0.5)
    # eval: identity, no rng needed
    np.testing.assert_array_equal(np.asarray(do.apply({}, x)), np.ones((4, 6)))
    # train: masked + rescaled, deterministic under a fixed rng
    y1 = do.apply({}, x, rng=jax.random.PRNGKey(3), train=True)
    y2 = do.apply({}, x, rng=jax.random.PRNGKey(3), train=True)
    np.testing.assert_array_equal(np.asarray(y1), np.asarray(y2))
    vals = set(np.unique(np.asarray(y1)))
    assert vals <= {0.0, 2.0} and len(vals) == 2

    two = L.ConcatenateLayers([L.Linear(6, 2, bias=False),
                               L.Linear(6, 3, bias=False)])
    p = two.init(jax.random.PRNGKey(4))
    assert two.apply(p, x).shape == (4, 5)

    summed = L.SumLayers([L.Identity(), L.Identity()])
    np.testing.assert_array_equal(
        np.asarray(summed.apply(summed.init(jax.random.PRNGKey(5)), x)),
        2 * np.ones((4, 6)))

    cat = L.Concatenate(axis=1)
    assert cat.apply({}, [x, x]).shape == (4, 12)


def test_layers_tower_trains_in_engine_style():
    """A layers-built tower jits/grads like the hand-written ones (the
    engine contract: params are a plain pytree)."""
    tower = L.Sequence(L.Linear(10, 32, activation="relu"),
                       L.DropOut(0.2), L.Linear(32, 1))
    params = tower.init(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (16, 10))
    y = jax.random.normal(jax.random.PRNGKey(2), (16, 1))

    def loss(params):
        return jnp.mean((tower.apply(params, x) - y) ** 2)

    l0 = float(loss(params))
    g = jax.jit(jax.grad(loss))(params)
    params = jax.tree.map(lambda p, gg: p - 0.1 * gg, params, g)
    assert float(loss(params)) < l0
