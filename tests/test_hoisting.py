"""Pull smoothing (prefetch hoisting): lookahead made spatial.

The planner moves pulls of over-target batches into earlier underfull
batches as prefetches, so the static pull capacity can sit near the MEAN
per-(worker, owner) bucket instead of the max. Two things must hold:

1. VALUE SAFETY: hoisting only changes WHEN a row crosses the wire, never
   which value any forward pass reads — training is bit-identical with
   hoisting on vs off (the planner only hoists pulls whose row provably
   cannot change between the prefetch and the read).
2. The smoothing actually flattens the bucket maxima.
"""

import numpy as np
import pytest

import jax

from herald_tpu import HeraldConfig
from herald_tpu.data import synthetic_ctr_data
from herald_tpu.models import get_model
from herald_tpu.sched.sizing import TrafficProfile, profile_planned_traffic
from herald_tpu.train.cached import CachedEngine

S, B, ROWS, STEPS = 8, 16, 6000, 14
WARM = 4


def _cfg(**kw):
    # bound=2: quiet batches stay quiet (hot re-reads tolerate small
    # staleness instead of refreshing every step — reference HET --bound)
    base = dict(model="wdl_criteo", batch_size=B, embedding_dim=8,
                comm_mode="hybrid", learning_rate=0.5,
                cache_limit_ratio=0.5, staleness_bound=2)
    base.update(kw)
    return HeraldConfig(**base)


def _data():
    model = get_model("wdl_criteo")
    return synthetic_ctr_data(model.spec, S * B * STEPS, seed=21,
                              num_rows=ROWS)


def _run(cfg, data):
    eng = CachedEngine(cfg, table_rows=ROWS)
    pl = eng.make_planner(data[1], epochs=1, n_threads=1)
    st = eng.init_cached_state(0)
    st, stats = eng.train_epoch_cached(st, pl, *data, steps=STEPS)
    assert int(np.asarray(stats["overflow"]).sum()) == 0
    st = eng.sync_cache(st, pl)
    perf = pl.perf()
    pl.close()
    return st, perf


def test_hoisting_is_value_invisible():
    if jax.device_count() < S:
        pytest.skip("needs 8 virtual devices")
    data = _data()
    st_off, perf_off = _run(_cfg(), data)
    st_on, perf_on = _run(_cfg(sched_pull_target=24, sched_hoist_window=6,
                               sched_prefetch_slots=64), data)
    assert perf_on["hoisted_pull"] > 0, "nothing was hoisted"
    assert perf_off["hoisted_pull"] == 0
    # identical training: every state leaf bit-equal
    for (pa, a), (pb, b) in zip(
            jax.tree_util.tree_flatten_with_path(st_off)[0],
            jax.tree_util.tree_flatten_with_path(st_on)[0]):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                      err_msg=str(pa))


def test_hoisting_flattens_bucket_maxima():
    """Bursty stream: alternating global batches of hot-pool reuse (few
    pulls, spare bucket room) and cold fresh ids (pull spikes) — the
    regime where smoothing pays. On a uniform stream max == mean and
    there is nothing to hoist (checked too)."""
    dense, sparse, labels = _data()
    gb = S * B
    for seg in range(STEPS):             # 3-of-4 batches -> hot pool,
        if seg % 4 == 3:                 # every 4th -> cold miss spike
            continue
        lo = seg * gb
        sparse[lo:lo + gb] = sparse[lo:lo + gb] % 500
    data = (dense, sparse, labels)

    def steady_profile(cfg):
        eng = CachedEngine(cfg, table_rows=ROWS)
        pl = eng.make_planner(data[1], epochs=1, n_threads=1)
        steps, _ = profile_planned_traffic(pl, data[1], S)
        perf = pl.perf()
        pl.close()
        return (TrafficProfile.from_steps(steps[WARM:]),
                TrafficProfile.from_steps(steps), perf)

    off, off_full, _ = steady_profile(_cfg())
    assert off.max_pull_bucket > 1.3 * off.mean_pull_bucket, off  # bursty
    target = off.pull_target()
    on, on_full, perf_on = steady_profile(
        _cfg(sched_pull_target=target, sched_hoist_window=6,
             sched_prefetch_slots=256))
    assert perf_on["hoisted_pull"] > 0
    # total pulled rows unchanged over the WHOLE stream (hoisting moves
    # pulls across steps, never adds/drops them)
    assert on_full.total_pulls == off_full.total_pulls
    # the steady-state max bucket collapses toward the target
    assert on.max_pull_bucket < 0.9 * off.max_pull_bucket, (on, off)
    assert on.max_pull_bucket <= target + 8, (on.max_pull_bucket, target)


def test_leveling_smooths_below_unattainable_target():
    """When the target is set BELOW what the window can absorb, the
    fill-to-target rule alone stalls (every window entry is instantly
    'full'), but the leveling arm — hoist into the least-filled entry
    whenever it strictly lowers the donor's bucket by 2+ — keeps
    flattening peaks. Pin that the max bucket still drops, and that
    value safety is preserved (bit-identical training states)."""
    data = _data()
    gb = S * B
    sparse = data[1]
    for seg in range(STEPS):             # same bursty stream as above
        if seg % 4 == 3:
            continue
        lo = seg * gb
        sparse[lo:lo + gb] = sparse[lo:lo + gb] % 500
    data = (data[0], sparse, data[2])

    def steady_profile(cfg):
        eng = CachedEngine(cfg, table_rows=ROWS)
        pl = eng.make_planner(data[1], epochs=1, n_threads=1)
        steps, _ = profile_planned_traffic(pl, data[1], S)
        perf = pl.perf()
        pl.close()
        return TrafficProfile.from_steps(steps[WARM:]), perf

    off, _ = steady_profile(_cfg())
    # target=1 is unattainable on this stream; only leveling can act
    on, perf_on = steady_profile(
        _cfg(sched_pull_target=1, sched_hoist_window=6,
             sched_prefetch_slots=256))
    assert perf_on["hoisted_pull"] > 0
    assert on.max_pull_bucket < off.max_pull_bucket, (on, off)

    if jax.device_count() >= S:
        st_off, _ = _run(_cfg(), data)
        st_on, _ = _run(_cfg(sched_pull_target=1, sched_hoist_window=6,
                             sched_prefetch_slots=256), data)
        for (pa, a), (pb, b) in zip(
                jax.tree_util.tree_flatten_with_path(st_off)[0],
                jax.tree_util.tree_flatten_with_path(st_on)[0]):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                          err_msg=str(pa))
