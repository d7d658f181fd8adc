"""Lookahead scheduler tests.

- LRU simulator semantics vs the documented return-code contract
  (reference `laia/include/mini_lru_cache.h:54-136`).
- Native C++ planner vs the numpy mirror: identical assignments, plans,
  and traffic counters (reference analog: `laia/test/test_laia_scheduler.py`
  + the golden-stats fixture `laia/test/wdl_criteo_cache_perf.txt`).
- Prefetch-window protocol: every sample of every global batch is served
  exactly once; plans are one batch ahead.
"""

import numpy as np
import pytest

from herald_tpu.sched import (LookaheadScheduler, NativeScheduler,
                              PyLruSim, PyScheduler)

NRANK = 4
MBS = 8
TABLES = 6
ROWS = 500


def _ids(n=NRANK * MBS * 12, seed=0):
    rng = np.random.default_rng(seed)
    # zipf-ish skew so caching matters
    raw = rng.zipf(1.3, size=(n, TABLES))
    return ((raw - 1) % ROWS).astype(np.int64)


# ----------------------------------------------------------------------
def test_lru_sim_return_codes():
    c = PyLruSim(2, 100)
    assert c.get(1) == 0          # miss, insert
    assert c.get(1) == -1         # hit
    assert c.get(2) == 0
    assert c.get(3) == 1          # insert, evicts fresh key 1
    assert not c.check(1)
    c.outdate(2)
    assert not c.check(2)
    assert c.get(2) == -2         # outdated hit -> update_pull
    assert c.check(2)


def test_native_matches_numpy_mirror():
    ids = _ids()
    batch_num = len(ids) // (NRANK * MBS)
    native = NativeScheduler(ids, NRANK, MBS, batch_num, epochs=1,
                             cache_size=60, n_threads=1)
    native.start()
    py = PyScheduler(ids, NRANK, MBS, cache_size=60)
    for b in range(batch_num):
        got = native.pop()
        assert got is not None, f"native ended early at batch {b}"
        n_assign, n_plans = got
        p_assign, p_plans = py.plan_next()
        np.testing.assert_array_equal(n_assign, p_assign,
                                      err_msg=f"assign batch {b}")
        for z in range(NRANK):
            np.testing.assert_array_equal(n_plans[z], p_plans[z],
                                          err_msg=f"plan b{b} w{z}")
    # native runs one extra lookahead batch beyond the epoch; drain it so
    # its counters match the mirror's if we replicate it
    extra = native.pop()
    assert extra is not None
    py.plan_next()
    assert native.pop() is None   # end of stream
    assert native.perf() == py.perf()


def test_assignment_is_balanced_partition():
    ids = _ids(seed=1)
    batch_num = len(ids) // (NRANK * MBS)
    native = NativeScheduler(ids, NRANK, MBS, batch_num, epochs=1,
                             cache_size=60, n_threads=2)
    native.start()
    for b in range(batch_num):
        assign, plans = native.pop()
        assert assign.shape == (NRANK, MBS)
        # exactly the global batch's samples, each once
        expect = (b * NRANK * MBS + np.arange(NRANK * MBS)) % len(ids)
        np.testing.assert_array_equal(np.sort(assign.reshape(-1)),
                                      np.sort(expect))


def test_affinity_beats_round_robin():
    """The scheduler's whole point: assignments must hit simulated caches
    more often than a round-robin split (Herald NSDI'24 core claim)."""
    ids = _ids(n=NRANK * MBS * 30, seed=2)
    cache = 80
    py = PyScheduler(ids, NRANK, MBS, cache_size=cache)
    for _ in range(len(ids) // (NRANK * MBS)):
        py.plan_next()
    sched_miss = py.perf()["miss_pull"]

    # round-robin baseline: contiguous strided assignment
    class RR(PyScheduler):
        def plan_next(self):
            gbs = self.nrank * self.mbs
            start = self._batch * gbs
            self._batch += 1
            idx = (start + np.arange(gbs)) % self.n
            assign = idx.reshape(self.mbs, self.nrank).T
            plans = [np.empty(0, np.int64)] * self.nrank
            for z in range(self.nrank):
                uniq = np.unique(self.ids[assign[z]])
                for k in uniq:
                    res = self.caches[z].get(int(k))
                    if res >= 0:
                        self.counters["miss_pull"][z] += 1
            return assign, plans

    rr = RR(ids, NRANK, MBS, cache_size=cache)
    for _ in range(len(ids) // (NRANK * MBS)):
        rr.plan_next()
    rr_miss = rr.perf()["miss_pull"]
    assert sched_miss < rr_miss, (sched_miss, rr_miss)


def test_prefetch_window_serves_all_batches():
    ids = _ids(n=NRANK * MBS * 10, seed=3)
    sched = LookaheadScheduler(ids, NRANK, batch_size=MBS, cache_size=60,
                               epochs=2, queue_size=3)
    seen = []
    for b in range(sched.batch_num * 2):
        assign, plans = sched.get_batch(b % sched.batch_num)
        assert assign.shape == (NRANK, MBS)
        assert len(plans) == NRANK
        seen.append(assign.copy())
        sched.step_forward()
    # epoch 1 must cover every sample exactly once
    first_epoch = np.concatenate([a.reshape(-1)
                                  for a in seen[:sched.batch_num]])
    np.testing.assert_array_equal(
        np.sort(first_epoch),
        np.arange(sched.batch_num * NRANK * MBS) % len(ids))


def test_affinity_beats_roundrobin_on_reuse_heavy_stream():
    """The whole point of the scheduler (reference laia naive_scheduler
    vs LaiaScheduler A/B): with everything else equal, affinity placement
    must produce less cache traffic than round-robin on a reuse-heavy ID
    stream."""
    from herald_tpu.sched.planner import CachePlanner
    rng = np.random.default_rng(5)
    NRANK, MBS, T = 4, 32, 8
    n = NRANK * MBS * 24
    ROWS = 5000
    ids = (rng.zipf(2.0, (n, T)) - 1) % (ROWS // T)
    ids += np.arange(T) * (ROWS // T)

    def traffic(mode):
        pl = CachePlanner(ids, nrank=NRANK, batch_size=MBS,
                          cache_rows=MBS * T, num_shards=NRANK,
                          rows_per_shard=(ROWS + NRANK - 1) // NRANK,
                          epochs=1, n_threads=1, assign_mode=mode)
        while pl.pop() is not None:
            pass
        p = pl.perf()
        pl.close()
        return sum(p[k] for k in ("miss_pull", "miss_push",
                                  "update_pull", "update_push"))

    rr = traffic("roundrobin")
    af = traffic("affinity")
    assert af < rr, (af, rr)


def test_planner_uniq_inv_matches_numpy_unique():
    """Host-side dedup contract: every micro-program's uniq/inv must be
    exactly np.unique(assigned_batch_ids, return_inverse=True) — the
    arrays the device step consumes in place of jnp.unique (uniq sorted
    ascending, -1 padding at the tail, inv flat in (sample, table)
    position order). The whole-step exactness suites cover this
    end-to-end; this pins the arrays themselves for fast diagnosis."""
    from herald_tpu.sched.planner import CachePlanner
    rng = np.random.default_rng(11)
    nrank, mbs, T, rows = 4, 8, 6, 500
    n = nrank * mbs * 7
    # skewed ids with plenty of duplicates
    ids = (rng.zipf(1.3, size=(n, T)) % rows).astype(np.int64)
    pl = CachePlanner(ids, nrank=nrank, batch_size=mbs, cache_rows=256,
                      num_shards=1, rows_per_shard=rows, epochs=1,
                      n_threads=2)
    steps = 0
    while True:
        prog = pl.pop()
        if prog is None:
            break
        steps += 1
        for z in range(nrank):
            batch = ids[prog.assign[z]]              # [mbs, T]
            uq, iv = np.unique(batch.reshape(-1), return_inverse=True)
            u = len(uq)
            np.testing.assert_array_equal(prog.uniq[z][:u], uq)
            assert (prog.uniq[z][u:] == -1).all()
            np.testing.assert_array_equal(prog.inv[z], iv)
            # slots/pulls ride the same order: one entry per unique key
            assert (prog.slots[z][u:] == pl.cache_rows).all()
    assert steps == 7
    pl.close()

def test_planner_uniq_inv_exact_at_reference_scale():
    """Regression: the batch-read sort packs (key << pos_bits) | pos and
    a fixed 4-byte-pass radix sort left bits >= 32 unsorted — keys that
    share their low (32 - pos_bits) bits interleaved, the dedup walk
    emitted duplicate uniq entries, and the device then split a row's
    gradient across the duplicates (last scatter wins => silently lost
    deltas) at reference-scale tables. Engineered collisions: ids that
    agree in their low 19 bits but differ at bit 19+ must still dedup to
    exactly np.unique at criteo's 33.7M-row id range."""
    from herald_tpu.sched.planner import CachePlanner
    rng = np.random.default_rng(5)
    mbs, T, rows = 32, 8, 33_762_577
    n = mbs * 4
    base = rng.integers(0, 1 << 19, size=(n, T))
    high = rng.integers(0, rows >> 19, size=(n, T))
    ids = ((high << 19) | base).astype(np.int64) % rows
    # force explicit same-batch collision pairs: same low 19 bits,
    # different high bits
    ids[1] = ids[0] | (1 << 20)
    ids[2] = ids[0] | (1 << 23)
    ids = np.clip(ids, 0, rows - 1)
    pl = CachePlanner(ids, nrank=1, batch_size=mbs,
                      cache_rows=4 * mbs * T, num_shards=1,
                      rows_per_shard=rows, epochs=1, n_threads=2)
    steps = 0
    while True:
        prog = pl.pop()
        if prog is None:
            break
        steps += 1
        batch = ids[prog.assign[0]]
        uq, iv = np.unique(batch.reshape(-1), return_inverse=True)
        u = len(uq)
        np.testing.assert_array_equal(prog.uniq[0][:u], uq)
        assert (prog.uniq[0][u:] == -1).all()
        np.testing.assert_array_equal(prog.inv[0], iv)
        # no duplicate slots among the live entries: a duplicated uniq
        # key would surface as two entries sharing one cache slot
        live = prog.slots[0][:u]
        assert len(np.unique(live)) == u
    assert steps == 4
    pl.close()
