"""Flush-free chunk program variant (config.sched_noflush_variant).

A chunk whose micro-programs carry zero flushes dispatches a compiled
variant of the scanned cached epoch with the whole flush phase removed —
no F_cap-wide cache gather, no flush exchange, no owner-table scatter
pair, no delta-zeroing scatter. This is the steady state of the
solo/big-cache regime (evictions stop and no remote reader forces a
planned flush), i.e. the single-chip headline path.

Pinned here: the solo big-cache run takes the fast path on EVERY chunk
and is bit-identical to the always-flush program; the multi-worker run
is bit-identical whichever dispatch fires; and the compiled flush-free
program moves exactly the flush-leg fewer all-to-all bytes.
"""

import numpy as np
import pytest

import jax

from herald_tpu import HeraldConfig
from herald_tpu.data import synthetic_ctr_data
from herald_tpu.models import get_model
from herald_tpu.train.cached import CachedEngine

ROWS = 1500
B = 16


def _data(n, seed=5, rows=ROWS):
    model = get_model("wdl_criteo")
    return synthetic_ctr_data(model.spec, n, seed=seed, num_rows=rows)


def _run_solo(variant_on: bool, steps=12):
    cfg = HeraldConfig(model="wdl_criteo", batch_size=B, embedding_dim=8,
                       comm_mode="local", learning_rate=0.5,
                       cache_limit_ratio=1.0,
                       sched_noflush_variant=variant_on)
    dense, sparse, labels = _data(B * steps)
    eng = CachedEngine(cfg, table_rows=ROWS)
    pl = eng.make_planner(sparse, epochs=1, n_threads=1)
    st = eng.init_cached_state(0)
    done = 0
    while done < steps:
        st, stats = eng.train_epoch_cached(st, pl, dense, sparse, labels,
                                           steps=4)
        if stats is None:
            break
        assert int(np.asarray(stats["overflow"]).sum()) == 0
        done += len(np.asarray(stats["loss"]))
    st = eng.sync_cache(st, pl)
    pl.close()
    return eng, st


def test_solo_big_cache_every_chunk_flush_free_and_bit_exact():
    """cache >= table and one worker: no evictions, no remote readers —
    every chunk qualifies, and the result matches the always-flush
    program to the last bit on every state array."""
    eng_on, st_on = _run_solo(True)
    eng_off, st_off = _run_solo(False)
    assert eng_on.noflush_chunks == 3          # 12 steps / 4-step chunks
    assert eng_off.noflush_chunks == 0
    np.testing.assert_array_equal(np.asarray(st_on.table),
                                  np.asarray(st_off.table))
    np.testing.assert_array_equal(np.asarray(st_on.cache),
                                  np.asarray(st_off.cache))
    for a, b in zip(jax.tree.leaves(st_on.dense),
                    jax.tree.leaves(st_off.dense)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_mesh_dispatch_is_transparent():
    """8-worker hybrid: whatever mix of chunk programs the dispatch picks,
    the result is bit-identical to the always-flush run (small id space ->
    cross-worker reads -> most chunks DO flush; the guard is that a
    qualifying chunk, if any, changes nothing)."""
    if jax.device_count() < 8:
        pytest.skip("needs 8 virtual devices")
    steps = 12

    def run(variant_on):
        cfg = HeraldConfig(model="wdl_criteo", batch_size=8,
                           embedding_dim=8, comm_mode="hybrid",
                           learning_rate=0.5, cache_limit_ratio=0.5,
                           sched_noflush_variant=variant_on)
        dense, sparse, labels = _data(8 * 8 * steps, seed=9, rows=600)
        eng = CachedEngine(cfg, table_rows=600)
        pl = eng.make_planner(sparse, epochs=1, n_threads=1)
        st = eng.init_cached_state(0)
        st, stats = eng.train_epoch_cached(st, pl, dense, sparse, labels,
                                           steps=steps)
        assert int(np.asarray(stats["overflow"]).sum()) == 0
        st = eng.sync_cache(st, pl)
        pl.close()
        return eng, st

    _, st_a = run(True)
    _, st_b = run(False)
    np.testing.assert_array_equal(np.asarray(st_a.table),
                                  np.asarray(st_b.table))
    np.testing.assert_array_equal(np.asarray(st_a.cache),
                                  np.asarray(st_b.cache))


def test_noflush_program_drops_exactly_the_flush_leg():
    """Compiled-HLO pin: per scanned step, the flush-free program moves
    flush-exchange-bytes fewer all-to-all bytes (ids + f32 deltas), and
    the pull leg is untouched."""
    if jax.device_count() < 8:
        pytest.skip("needs 8 virtual devices")
    from herald_tpu.utils.hlo_stats import (collective_bytes,
                                            exchange_a2a_bytes)
    cfg = HeraldConfig(model="wdl_criteo", batch_size=B, embedding_dim=8,
                       comm_mode="hybrid", use_cache=True,
                       cache_limit=int(0.25 * ROWS))
    eng = CachedEngine(cfg, table_rows=ROWS)
    st = eng.init_cached_state(0)
    (d, y, uniq, inv, slots, pulls, fids, fslots,
     pfids, pfslots) = eng.example_step_args()

    def stack(a):
        return jax.device_put(
            np.broadcast_to(np.asarray(a), (2,) + np.asarray(a).shape),
            eng._kdata_sharding)

    full = collective_bytes(eng._cached_epoch, st, stack(d),
                            stack(y), stack(slots), stack(pulls),
                            stack(fids), stack(fslots), stack(pfids),
                            stack(pfslots), stack(uniq), stack(inv))
    st2 = eng.init_cached_state(0)
    nofl = collective_bytes(eng._cached_epoch_noflush, st2, stack(d),
                            stack(y), stack(slots), stack(pulls),
                            stack(pfids), stack(pfslots), stack(uniq),
                            stack(inv))
    W = eng.width
    flush_leg = exchange_a2a_bytes(eng.flush_exchange, id_bytes=4,
                                   vec_bytes=W * 4, directions=1)
    assert full["all-to-all"] - nofl["all-to-all"] == flush_leg, \
        (full["all-to-all"], nofl["all-to-all"], flush_leg)
    # everything else in the step is unchanged
    assert full["all-reduce"] == nofl["all-reduce"]
