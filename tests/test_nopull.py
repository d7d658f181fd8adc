"""Pull-free chunk program variant (config.sched_nopull_variant).

A flush-free chunk whose micro-programs ALSO carry zero pulls and zero
prefetch hoists dispatches a compiled variant of the scanned cached
epoch with the whole pull phase removed — no U_cap+P_cap table gather,
no pull exchange, no prefetch-insert scatter. This is the solo/big-cache
steady state one epoch in: every batch key is resident and no remote
writer creates staleness, so the planner stops emitting pulls entirely
(the regime the single-chip headline bench times over epochs 2..N).

Pinned here: the second epoch of a solo big-cache run takes the
pull-free path on EVERY chunk and is bit-identical to the always-pull
program; the multi-worker run is bit-identical whichever dispatch fires;
and the compiled pull-free program moves exactly the pull-leg fewer
all-to-all bytes.
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


def _run_solo(variant_on: bool, steps=12, epochs=2):
    cfg = HeraldConfig(model="wdl_criteo", batch_size=B, embedding_dim=8,
                       comm_mode="local", learning_rate=0.5,
                       cache_limit_ratio=1.0,
                       sched_nopull_variant=variant_on)
    dense, sparse, labels = _data(B * steps)
    eng = CachedEngine(cfg, table_rows=ROWS)
    pl = eng.make_planner(sparse, epochs=epochs, n_threads=1)
    st = eng.init_cached_state(0)
    done, total = 0, steps * epochs
    while done < total:
        st, stats = eng.train_epoch_cached(st, pl, dense, sparse, labels,
                                           steps=4)
        if stats is None:
            break
        assert int(np.asarray(stats["overflow"]).sum()) == 0
        done += len(np.asarray(stats["loss"]))
    st = eng.sync_cache(st, pl)
    pl.close()
    return eng, st


def test_solo_steady_state_every_chunk_pull_free_and_bit_exact():
    """cache >= table, one worker, epoch 2: everything resident and
    fresh — every epoch-2 chunk qualifies for the pull-free program, and
    the result matches the always-pull program to the last bit."""
    eng_on, st_on = _run_solo(True)
    eng_off, st_off = _run_solo(False)
    # epoch 1 warms the cache (first-touch pulls); epoch 2's 3 chunks
    # are pull-free. noflush fires on all 6 (no evictions ever).
    assert eng_on.nopull_chunks == 3, eng_on.nopull_chunks
    assert eng_on.noflush_chunks == 6
    assert eng_off.nopull_chunks == 0
    assert eng_off.noflush_chunks == 6   # noflush stays on independently
    np.testing.assert_array_equal(np.asarray(st_on.table),
                                  np.asarray(st_off.table))
    np.testing.assert_array_equal(np.asarray(st_on.cache),
                                  np.asarray(st_off.cache))
    for a, b in zip(jax.tree.leaves(st_on.dense),
                    jax.tree.leaves(st_off.dense)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_device_resident_feed_matches_direct_feed():
    """The idx-mode pull-free program (device-resident dataset, the
    bench/production shape) is bit-identical to the direct-feed one."""
    cfg = HeraldConfig(model="wdl_criteo", batch_size=B, embedding_dim=8,
                       comm_mode="local", learning_rate=0.5,
                       cache_limit_ratio=1.0, sched_nopull_variant=True)
    dense, sparse, labels = _data(B * 12)
    sparse32 = sparse.astype(np.int32)

    def run(device_feed):
        eng = CachedEngine(cfg, table_rows=ROWS)
        pl = eng.make_planner(sparse, epochs=2, n_threads=1)
        st = eng.init_cached_state(0)
        dev = eng.stage_dataset(dense, sparse32, labels) \
            if device_feed else None
        done = 0
        while done < 24:
            st, stats = eng.train_epoch_cached(
                st, pl, dense, sparse32, labels, steps=4,
                device_data=dev)
            done += len(np.asarray(stats["loss"]))
        st = eng.sync_cache(st, pl)
        pl.close()
        return eng, st

    def run_prestaged_direct():
        # the bench's tape-mode shape: every chunk pre-staged DIRECT-FEED
        # (assigned rows in HBM, no on-device assignment takes)
        eng = CachedEngine(cfg, table_rows=ROWS)
        pl = eng.make_planner(sparse, epochs=2, n_threads=1)
        st = eng.init_cached_state(0)
        staged = eng.stage_program_chunks(
            pl, 4, raw=(dense, sparse32, labels))
        assert len(staged) == 6
        for chunk in staged:
            st, _ = eng.train_epoch_staged(st, chunk)
        st = eng.sync_cache(st, pl)
        pl.close()
        return eng, st

    eng_a, st_a = run(True)
    eng_b, st_b = run(False)
    eng_c, st_c = run_prestaged_direct()
    assert eng_a.nopull_chunks == eng_b.nopull_chunks == 3
    assert eng_c.nopull_chunks == 3
    np.testing.assert_array_equal(np.asarray(st_a.table),
                                  np.asarray(st_b.table))
    np.testing.assert_array_equal(np.asarray(st_a.cache),
                                  np.asarray(st_b.cache))
    np.testing.assert_array_equal(np.asarray(st_a.table),
                                  np.asarray(st_c.table))
    np.testing.assert_array_equal(np.asarray(st_a.cache),
                                  np.asarray(st_c.cache))


def test_mesh_dispatch_is_transparent():
    """8-worker hybrid over two epochs: whatever mix of chunk programs
    the dispatch picks, the result is bit-identical to the
    always-full-program run."""
    if jax.device_count() < 8:
        pytest.skip("needs 8 virtual devices")
    steps = 12

    def run(variant_on):
        cfg = HeraldConfig(model="wdl_criteo", batch_size=8,
                           embedding_dim=8, comm_mode="hybrid",
                           learning_rate=0.5, cache_limit_ratio=1.0,
                           sched_nopull_variant=variant_on)
        dense, sparse, labels = _data(8 * 8 * steps, seed=9, rows=600)
        eng = CachedEngine(cfg, table_rows=600)
        pl = eng.make_planner(sparse, epochs=2, n_threads=1)
        st = eng.init_cached_state(0)
        for _ in range(2):
            st, stats = eng.train_epoch_cached(st, pl, dense, sparse,
                                               labels, steps=steps)
            assert int(np.asarray(stats["overflow"]).sum()) == 0
        st = eng.sync_cache(st, pl)
        pl.close()
        return eng, st

    eng_a, st_a = run(True)
    _, st_b = run(False)
    np.testing.assert_array_equal(np.asarray(st_a.table),
                                  np.asarray(st_b.table))
    np.testing.assert_array_equal(np.asarray(st_a.cache),
                                  np.asarray(st_b.cache))


def test_nopull_program_drops_exactly_the_pull_leg():
    """Compiled-HLO pin: per scanned step, the pull-free program moves
    pull-leg fewer all-to-all bytes than the flush-free one (ids out +
    table-dtype rows back for U_cap+P_cap slots), and the dense
    all-reduce is untouched."""
    if jax.device_count() < 8:
        pytest.skip("needs 8 virtual devices")
    from herald_tpu.utils.hlo_stats import (collective_bytes,
                                            exchange_a2a_bytes)
    cfg = HeraldConfig(model="wdl_criteo", batch_size=B, embedding_dim=8,
                       comm_mode="hybrid", use_cache=True,
                       cache_limit=int(0.25 * ROWS))
    eng = CachedEngine(cfg, table_rows=ROWS)
    (d, y, uniq, inv, slots, pulls, fids, fslots,
     pfids, pfslots) = eng.example_step_args()

    def stack(a):
        return jax.device_put(
            np.broadcast_to(np.asarray(a), (2,) + np.asarray(a).shape),
            eng._kdata_sharding)

    st = eng.init_cached_state(0)
    nofl = collective_bytes(eng._cached_epoch_noflush, st, stack(d),
                            stack(y), stack(slots), stack(pulls),
                            stack(pfids), stack(pfslots), stack(uniq),
                            stack(inv))
    st2 = eng.init_cached_state(0)
    # unpinned pull-free wire omits uniq (train/cached.py step body note)
    nopu = collective_bytes(eng._cached_epoch_nopull, st2, stack(d),
                            stack(y), stack(slots), stack(inv))
    pull_leg = exchange_a2a_bytes(eng.exchange, id_bytes=4,
                                  vec_bytes=eng.width * 4, directions=1)
    assert nofl["all-to-all"] - nopu["all-to-all"] == pull_leg, \
        (nofl["all-to-all"], nopu["all-to-all"], pull_leg)
    assert nofl["all-reduce"] == nopu["all-reduce"]
