"""Planner stress tests.

SURVEY §5: the reference configures no sanitizers and relies on
by-construction safety; the rebuild adds explicit stress tests instead.
These hammer the native planner across randomized configurations and
assert its structural invariants — slot consistency, capacity limits,
termination, and gradient conservation — under the parallel per-worker
planning path (csrc/herald_cache_planner.cc runs one thread per worker
with atomic state-word updates; a race would corrupt slots or counters
nondeterministically).
"""

import numpy as np

from herald_tpu.sched.planner import CachePlanner


def test_planner_randomized_invariants():
    _randomized_invariants(np.random.default_rng(123), 6,
                           [1, 2, 4, 8])


def test_planner_deterministic_across_thread_counts():
    """Programs must be identical for any n_threads: the candidate
    collection races benignly on which chunk first-touches a key, and the
    per-worker sort restores a deterministic order (mid-epoch resume and
    the multi-host identical-replan contract both depend on this)."""
    rng = np.random.default_rng(42)
    ids = (rng.zipf(1.3, (8 * 16 * 6, 8)) - 1) % 400
    ids += np.arange(8) * 400
    outs = []
    for nt in (1, 4):
        # owner_cap binds (defers planned flushes); flush_cap stays at
        # the default so mandatory eviction flushes always fit
        pl = CachePlanner(ids, nrank=8, batch_size=16, cache_rows=256,
                          num_shards=8, rows_per_shard=400, epochs=1,
                          n_threads=nt, owner_cap=8)
        progs = []
        while True:
            p = pl.pop()
            if p is None:
                break
            progs.append(p)
        assert pl.perf()["deferred_flush"] > 0   # budget actually binds
        pl.close()
        outs.append(progs)
    assert len(outs[0]) == len(outs[1]) > 0
    for a, b in zip(*outs):
        for f in ("assign", "slots", "pulls", "flush_ids", "flush_slots"):
            np.testing.assert_array_equal(getattr(a, f), getattr(b, f), f)


def test_planner_invariants_wide_nrank():
    """>32 workers: the 128-bit residency-word instantiation
    (make_planner dispatches to unsigned __int128; 16-byte atomic RMW)."""
    _randomized_invariants(np.random.default_rng(7), 2, [40, 64])


def _randomized_invariants(rng, trials, nrank_choices):
    for trial in range(trials):
        nrank = int(rng.choice(nrank_choices))
        mbs = int(rng.choice([8, 16, 32]))
        T = int(rng.integers(2, 10))
        rows = int(rng.integers(300, 3000))
        batches = int(rng.integers(4, 12))
        n = nrank * mbs * batches
        zipf_a = float(rng.uniform(1.3, 2.5))
        ids = (rng.zipf(zipf_a, (n, T)) - 1) % max(rows // T, 2)
        ids += (np.arange(T) * (rows // T)) % rows
        rows = int(ids.max()) + 1
        cache_rows = mbs * T * int(rng.integers(1, 4))
        pinned = int(rng.choice([0, 8, 64]))
        bound = int(rng.choice([0, 1, 3]))
        policy = str(rng.choice(["lru", "lfu", "lfuopt"]))
        mode = str(rng.choice(["affinity", "roundrobin"]))
        rps = (rows + nrank - 1) // nrank

        # sometimes enable pull smoothing (hoisting) so the stress
        # exercises the window manager + prefetch emission too
        hoist = bool(rng.choice([False, True]))
        pl = CachePlanner(ids, nrank=nrank, batch_size=mbs,
                          cache_rows=cache_rows, num_shards=nrank,
                          rows_per_shard=rps, epochs=1,
                          n_threads=int(rng.choice([1, 2, 4])),
                          policy=policy, assign_mode=mode,
                          pinned_rows=pinned, bound=bound,
                          pull_target=int(rng.integers(2, 12)) if hoist
                          else 0,
                          hoist_window=4 if hoist else 0,
                          prefetch_cap=32 if hoist else 0)
        C = pl.cache_rows
        steps = 0
        # per-worker live model of slot -> key, mirrors the device cache
        slot_key = [dict() for _ in range(nrank)]
        while True:
            prog = pl.pop()
            if prog is None:
                break
            steps += 1
            # the batch window's samples appear exactly once each
            gbs = nrank * mbs
            expect = ((steps - 1) * gbs + np.arange(gbs)) % n
            assert sorted(prog.assign.reshape(-1).tolist()) \
                == sorted(expect.tolist()), "assignment not a permutation"
            for z in range(nrank):
                uniq = np.unique(ids[prog.assign[z]])
                u = len(uniq)
                sl = prog.slots[z][:u]
                pu = prog.pulls[z][:u]
                # non-pinned keys get real slots; no two same-batch keys
                # share a slot
                live = sl[uniq >= pinned] if pinned else sl
                assert (live < C).all(), (trial, steps)
                assert len(set(live.tolist())) == len(live)
                # flush lists respect the static capacity
                f = prog.flush_ids[z]
                nf = int((f >= 0).sum())
                assert nf <= pl.F_cap
                # flushed slots must currently hold the flushed key
                for fid, fslot in zip(prog.flush_ids[z][:nf],
                                      prog.flush_slots[z][:nf]):
                    held = slot_key[z].get(int(fslot))
                    assert held is None or held == int(fid), \
                        (trial, steps, z, fid, fslot, held)
                # update the live model with this batch's residency
                for key, s, p in zip(uniq, sl, pu):
                    if s < C:
                        slot_key[z][int(s)] = int(key)
                # prefetched rows land in their reserved slots this batch
                if prog.prefetch_ids is not None:
                    pf_i = prog.prefetch_ids[z]
                    pf_s = prog.prefetch_slots[z]
                    for k2, s2 in zip(pf_i[pf_i >= 0], pf_s[pf_i >= 0]):
                        assert 0 <= s2 < C
                        # the reserved slot must not currently belong to a
                        # DIFFERENT resident key (it was free in the sim)
                        held = slot_key[z].get(int(s2))
                        assert held is None or held == int(k2), \
                            (trial, steps, z, k2, s2, held)
                        slot_key[z][int(s2)] = int(k2)
        assert steps == pl.batch_num, (steps, pl.batch_num)
        perf = pl.perf()
        assert all(v >= 0 for v in perf.values())
        pl.close()


def test_planner_epoch_shuffle():
    """Per-epoch reshuffle (shuffle_seed != 0): every epoch is a
    permutation of a window of the sample stream, epochs differ from each
    other, and the whole thing is deterministic across planner instances
    (resume contract)."""
    rng = np.random.default_rng(5)
    N, T, nrank, mbs = 4 * 8 * 6, 5, 4, 8
    ids = (rng.zipf(1.5, (N, T)) - 1) % 300

    def run(seed):
        pl = CachePlanner(ids, nrank=nrank, batch_size=mbs,
                          cache_rows=200, num_shards=nrank,
                          rows_per_shard=75, epochs=2, n_threads=2,
                          shuffle_seed=seed)
        epochs = [[], []]
        b = 0
        while True:
            p = pl.pop()
            if p is None:
                break
            epochs[b // pl.batch_num].extend(p.assign.reshape(-1).tolist())
            b += 1
        pl.close()
        return epochs

    e = run(7)
    gbs = nrank * mbs
    per_epoch = (N // nrank // mbs) * gbs

    def windows(ep):
        return [frozenset(ep[i:i + gbs]) for i in range(0, len(ep), gbs)]

    for ep in e:
        # full coverage, each sample exactly once per epoch
        assert sorted(ep) == list(range(per_epoch))
    # the shuffle actually changes batch composition vs stream order
    assert windows(e[0])[0] != frozenset(range(gbs))
    # and epochs differ from each other
    assert windows(e[0]) != windows(e[1]), "epochs should reshuffle"
    # deterministic across instances (resume contract)
    assert run(7) == e
    # seed changes the order
    assert run(8) != e
    # seed 0 = fixed stream order (reference Laia matrix semantics)
    e0 = run(0)
    assert windows(e0[0]) == [frozenset(range(i, i + gbs))
                              for i in range(0, per_epoch, gbs)]
