#!/usr/bin/env python
"""Micro-benchmark: Pallas kernels vs XLA-native equivalents on real TPU.

Run on hardware:  python benchmarks/pallas_bench.py
Prints one JSON object per op with us/call and effective GB/s.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from herald_tpu.ops.pallas import (embedding_gather, fm_second_order,
                                   rows_scatter_add)

ROWS, D, N, B, F = 4_000_000, 128, 8192, 256, 26


def timeit(f, *a, n=50):
    r = f(*a)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(n):
        r = f(*a)
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / n * 1e6


def main():
    key = jax.random.PRNGKey(0)
    table = 0.01 * jax.random.normal(key, (ROWS, D), jnp.bfloat16)
    # uniform ids (worst case for HBM locality)
    ids = jax.random.randint(jax.random.PRNGKey(1), (N,), 0, ROWS,
                             jnp.int32)
    uniq_ids = jnp.unique(ids, size=N, fill_value=0)
    grads = 0.01 * jax.random.normal(key, (N, D), jnp.bfloat16)
    emb = jax.random.normal(key, (B, F, D), jnp.float32)

    xla_gather = jax.jit(lambda t, i: jnp.take(t, i, axis=0))
    t_pl = timeit(embedding_gather, table, ids)
    t_xla = timeit(xla_gather, table, ids)
    bytes_moved = N * D * 2
    print(json.dumps({"op": "gather", "pallas_us": round(t_pl, 1),
                      "xla_us": round(t_xla, 1),
                      "pallas_gbps": round(bytes_moved / t_pl / 1e3, 1),
                      "xla_gbps": round(bytes_moved / t_xla / 1e3, 1)}))

    xla_scatter = jax.jit(lambda t, i, g: t.at[i].add(g),
                          donate_argnums=0)
    # donation consumes the table; rebuild between timings
    t_pl = timeit(lambda t, i, g: rows_scatter_add(t + 0, i, g),
                  table, uniq_ids, grads, n=20)
    t_xla = timeit(lambda t, i, g: xla_scatter(t + 0, i, g),
                   table, uniq_ids, grads, n=20)
    print(json.dumps({"op": "scatter_add(+copy)", "pallas_us": round(t_pl, 1),
                      "xla_us": round(t_xla, 1)}))

    def xla_fm(emb):
        s = jnp.sum(emb, axis=1)
        return 0.5 * jnp.sum(s * s - jnp.sum(emb * emb, axis=1), axis=1)

    t_pl = timeit(fm_second_order, emb)
    t_xla = timeit(jax.jit(xla_fm), emb)
    print(json.dumps({"op": "fm_second_order", "pallas_us": round(t_pl, 1),
                      "xla_us": round(t_xla, 1)}))


if __name__ == "__main__":
    main()
