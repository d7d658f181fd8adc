"""Optimizer unit tests (oracle: torch.optim on CPU), mirroring the
reference's optimizer tests vs TF (`tests/test_optimizer.py`)."""

import jax.numpy as jnp
import numpy as np
import pytest
import torch

from herald_tpu.optim import get_optimizer


def _run_ours(name, steps=5, lr=0.1, **kw):
    rng = np.random.default_rng(0)
    p0 = rng.standard_normal((4, 3)).astype(np.float32)
    grads = [rng.standard_normal((4, 3)).astype(np.float32)
             for _ in range(steps)]
    opt = get_optimizer(name, lr=lr, **kw)
    p = jnp.asarray(p0)
    slots = opt.init_slots(p)
    for t, g in enumerate(grads):
        p, slots = opt.apply_rows(p, jnp.asarray(g), slots,
                                  jnp.asarray(t + 1))
    return p0, grads, np.asarray(p)


def _run_torch(p0, grads, make_opt):
    p = torch.nn.Parameter(torch.tensor(p0))
    opt = make_opt([p])
    for g in grads:
        opt.zero_grad()
        p.grad = torch.tensor(g)
        opt.step()
    return p.detach().numpy()


@pytest.mark.parametrize("name,make", [
    ("sgd", lambda ps: torch.optim.SGD(ps, lr=0.1)),
    ("adagrad", lambda ps: torch.optim.Adagrad(ps, lr=0.1, eps=1e-7)),
])
def test_matches_torch(name, make):
    p0, grads, ours = _run_ours(name)
    theirs = _run_torch(p0, grads, make)
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-5)


def test_adam_matches_torch():
    p0, grads, ours = _run_ours("adam", lr=0.01)
    theirs = _run_torch(
        p0, grads, lambda ps: torch.optim.Adam(ps, lr=0.01, eps=0.0))
    # our eps sits outside sqrt like the reference (server/optimizer.h);
    # compare loosely against torch's placement
    np.testing.assert_allclose(ours, theirs, rtol=5e-3, atol=5e-4)


def test_momentum_matches_torch():
    p0, grads, ours = _run_ours("momentum", lr=0.1, momentum=0.9)
    theirs = _run_torch(
        p0, grads, lambda ps: torch.optim.SGD(ps, lr=0.1, momentum=0.9))
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-5)


def test_nesterov_matches_torch():
    p0, grads, ours = _run_ours("nesterov", lr=0.1, momentum=0.9)
    theirs = _run_torch(
        p0, grads,
        lambda ps: torch.optim.SGD(ps, lr=0.1, momentum=0.9, nesterov=True))
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-5)


def test_mask_freezes_padding_rows():
    opt = get_optimizer("adam", lr=0.1)
    p = jnp.ones((4, 3))
    slots = opt.init_slots(p)
    g = jnp.ones((4, 3))
    mask = jnp.array([True, True, False, False])
    p2, slots2 = opt.apply_rows(p, g, slots, jnp.asarray(1), mask=mask)
    assert not np.allclose(np.asarray(p2[:2]), 1.0)
    np.testing.assert_array_equal(np.asarray(p2[2:]), 1.0)
    np.testing.assert_array_equal(np.asarray(slots2["m"][2:]), 0.0)


def test_counts_scaling():
    # ApplyCache semantics: grads divided by per-row update counts
    opt = get_optimizer("sgd", lr=1.0)
    p = jnp.zeros((2, 2))
    g = jnp.ones((2, 2)) * 4
    counts = jnp.array([4, 1], jnp.int32)
    p2, _ = opt.apply_rows(p, g, {}, jnp.asarray(1), counts=counts)
    np.testing.assert_allclose(np.asarray(p2), [[-1, -1], [-4, -4]])


def test_lamb_rows_weight_decay_is_decoupled_once():
    """Regression: LAMB apply_rows used to add weight decay into the
    gradient (polluting m/v) AND into the direction — double decay vs
    _lamb_dense. Verify the moments see the raw gradient only."""
    import jax.numpy as jnp
    from herald_tpu.optim.optimizers import get_optimizer
    opt = get_optimizer("lamb", lr=0.1, weight_decay=0.5)
    rows = jnp.ones((4, 8), jnp.float32) * 2.0
    grads = jnp.ones((4, 8), jnp.float32) * 0.25
    slots = {k: jnp.zeros_like(rows) for k in opt.slot_names}
    step = jnp.asarray(1, jnp.int32)
    new_rows, new_slots = opt.apply_rows(rows, grads, slots, step)
    # m after step 1 (bias-uncorrected) = (1-beta1) * g — with coupled
    # decay it would be (1-beta1) * (g + wd*rows) = (1-beta1) * 1.25
    expect_m = (1 - opt.beta1) * 0.25
    np.testing.assert_allclose(np.asarray(new_slots["m"]),
                               np.full((4, 8), expect_m), rtol=1e-6)
