"""Pallas kernel correctness vs XLA-native oracles (interpret mode on the
CPU mesh; `benchmarks/pallas_bench.py` runs them compiled on real TPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from herald_tpu.ops.pallas import (embedding_gather, fm_second_order,
                                   rows_scatter_add)


def test_gather_matches_take():
    rng = np.random.default_rng(0)
    table = rng.standard_normal((512, 128)).astype(np.float32)
    ids = rng.integers(0, 512, 60).astype(np.int32)  # non-multiple of block
    out = embedding_gather(jnp.asarray(table), jnp.asarray(ids),
                           interpret=True)
    np.testing.assert_allclose(np.asarray(out), table[ids], rtol=1e-6)


def test_scatter_add_unique_rows():
    rng = np.random.default_rng(1)
    table = rng.standard_normal((104, 128)).astype(np.float32)
    ids = np.array([3, 7, 42, 99, 0, 55], np.int32)   # unique (contract)
    grads = rng.standard_normal((6, 128)).astype(np.float32)
    expect = table.copy()
    for i, g in zip(ids, grads):
        expect[i] += g
    out = rows_scatter_add(jnp.asarray(table), jnp.asarray(ids),
                           jnp.asarray(grads), interpret=True)
    np.testing.assert_allclose(np.asarray(out), expect, rtol=1e-5,
                               atol=1e-6)
    # untouched rows unchanged
    mask = np.ones(104, bool)
    mask[ids] = False
    np.testing.assert_array_equal(np.asarray(out)[mask], table[mask])


def test_fm_second_order_matches_reference_math():
    rng = np.random.default_rng(2)
    emb = rng.standard_normal((128, 26, 16)).astype(np.float32)
    s = emb.sum(axis=1)
    expect = 0.5 * (s * s - (emb * emb).sum(axis=1)).sum(axis=1)
    out = fm_second_order(jnp.asarray(emb), interpret=True)
    np.testing.assert_allclose(np.asarray(out), expect, rtol=1e-4,
                               atol=1e-4)


def test_hot_onehot_gather_zero_for_cold_ids():
    from herald_tpu.ops.pallas import hot_onehot_gather
    rng = np.random.default_rng(3)
    H, D, N = 256, 128, 96
    table = rng.standard_normal((H, D)).astype(np.float32)
    ids = np.where(rng.random(N) < 0.7, rng.integers(0, H, N),
                   1_000_000).astype(np.int32)
    out = np.asarray(hot_onehot_gather(jnp.asarray(table), jnp.asarray(ids),
                                       block_ids=32, interpret=True))
    expect = np.where((ids < H)[:, None], table[np.clip(ids, 0, H - 1)], 0.0)
    np.testing.assert_allclose(out, expect, rtol=1e-6, atol=1e-6)


def test_hot_onehot_push_is_exact_segment_sum():
    from herald_tpu.ops.pallas import hot_onehot_push
    rng = np.random.default_rng(4)
    H, D, N = 256, 128, 200
    # duplicates + cold (out-of-range) ids
    ids = np.where(rng.random(N) < 0.8, rng.integers(0, H, N),
                   1_000_000).astype(np.int32)
    grads = rng.standard_normal((N, D)).astype(np.float32)
    out = np.asarray(hot_onehot_push(jnp.asarray(ids), jnp.asarray(grads),
                                     num_rows=H, block_rows=64,
                                     interpret=True))
    expect = np.zeros((H, D), np.float32)
    np.add.at(expect, np.clip(ids, 0, H - 1),
              np.where((ids < H)[:, None], grads, 0.0))
    np.testing.assert_allclose(out, expect, rtol=1e-5, atol=1e-5)
