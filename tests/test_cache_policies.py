"""Cache replacement policy tests (LRU / LFU / LFUOpt).

Oracle: brute-force victim selection — LFU evicts min (freq, recency);
LFUOpt additionally exempts entries at the frequency cap (the reference's
permanent store, `src/hetu_cache/include/lfuopt_cache.h:19-40`). Victims
are observed through the planner's micro-programs: an evicted key's next
read is a miss (pull with a fresh insert), a resident key's read is a hit.
"""

import numpy as np
import pytest

from herald_tpu.sched.planner import CachePlanner

ROWS = 64
T = 2     # tables per sample


def _run_policy(policy, batches):
    """Drive a 1-worker planner through scripted batches; returns the
    per-batch pull masks aligned with each batch's sorted unique keys."""
    ids = np.array(batches, np.int64).reshape(-1, T)
    mbs = 1
    pl = CachePlanner(ids, nrank=1, batch_size=mbs, cache_rows=4,
                      num_shards=1, rows_per_shard=ROWS, epochs=1,
                      n_threads=1, policy=policy)
    out = []
    for _ in range(pl.batch_num):
        prog = pl.pop()
        keys = np.unique(ids[prog.assign[0]])
        out.append((keys, prog.pulls[0][: len(keys)].copy()))
    return out


def test_lru_vs_lfu_eviction_choice():
    # cache of 4 rows; key 1 is touched often (high freq), key 9 once.
    # batches (1 sample x 2 tables each):
    batches = [
        [1, 2], [1, 3], [1, 9],    # cache now {1,2,3,9}; freq(1)=3
        [4, 1],                    # insert 4 -> evict one of {2,3,9}
        [2, 1],                    # read 2: hit iff 2 survived
    ]
    # LRU: victim is least-recent = 2 -> reading 2 misses
    res_lru = _run_policy("lru", batches)
    keys, pulls = res_lru[4]
    assert set(keys) == {1, 2}
    assert pulls[list(keys).index(2)] == 1      # 2 was evicted under LRU
    # LFU: 2, 3, 9 all have freq 1; tie falls to least-recent = 2 as well,
    # but 1 (freq 4) is never the victim. Use a sharper scenario: touch 2
    # again so 9 becomes the unique min-freq victim.
    batches = [
        [1, 2], [1, 3], [2, 3],    # freq: 1->2, 2->2, 3->2
        [9, 1],                    # insert 9 (freq 1); cache {1,2,3,9}
        [4, 1],                    # insert 4 -> LFU evicts 9 (min freq)
        [2, 3],                    # both must still be hits under LFU
    ]
    res_lfu = _run_policy("lfu", batches)
    keys, pulls = res_lfu[5]
    assert set(keys) == {2, 3}
    assert (pulls == 0).all(), "LFU must keep frequent keys 2,3 resident"
    # same scenario under LRU evicts 2 (least recent), so reading 2 misses
    res_lru2 = _run_policy("lru", batches)
    keys2, pulls2 = res_lru2[5]
    assert pulls2[list(keys2).index(2)] == 1


def test_lfuopt_permanent_rows_survive():
    # key 7 is read 12 times (> kUseCntMax=10) -> graduates to permanent;
    # then a churn of fresh keys floods the cache. 7 must stay resident.
    batches = [[7, i + 20] for i in range(12)]          # 7 hot, churn
    batches += [[30 + i, 40 + i] for i in range(6)]     # pure churn
    batches += [[7, 60]]                                # 7 must be a hit
    res = _run_policy("lfuopt", batches)
    keys, pulls = res[-1]
    assert 7 in keys
    assert pulls[list(keys).index(7)] == 0, \
        "LFUOpt permanent row was evicted"
    # under plain LRU the churn evicts 7
    res_lru = _run_policy("lru", batches)
    keys, pulls = res_lru[-1]
    assert pulls[list(keys).index(7)] == 1


def test_unknown_policy_rejected():
    ids = np.zeros((8, T), np.int64)
    with pytest.raises(KeyError):
        CachePlanner(ids, nrank=1, batch_size=1, cache_rows=4,
                     num_shards=1, rows_per_shard=ROWS, policy="mru")


def test_staleness_bound_trades_pulls_for_staleness():
    """Reference HET --bound semantics (PSFhandle_embedding.cc:30-64):
    bound=0 refreshes on every remote update; bound>0 keeps using the
    cached row until it missed more than `bound` updates, strictly
    reducing update_pull traffic. bound=0 must reproduce the old exact
    counters."""
    import numpy as np
    from herald_tpu.sched.planner import CachePlanner
    rng = np.random.default_rng(7)
    NRANK, MBS, T = 4, 16, 8
    n = NRANK * MBS * 24
    ROWS = 2000
    # hot-heavy stream -> lots of cross-worker sharing -> staleness churn
    ids = (rng.zipf(2.2, (n, T)) - 1) % (ROWS // T)
    ids += np.arange(T) * (ROWS // T)

    def run(bound):
        pl = CachePlanner(ids, nrank=NRANK, batch_size=MBS,
                          cache_rows=MBS * T, num_shards=NRANK,
                          rows_per_shard=(ROWS + NRANK - 1) // NRANK,
                          epochs=1, n_threads=1, bound=bound)
        while pl.pop() is not None:
            pass
        p = pl.perf()
        pl.close()
        return p

    p0 = run(0)
    p2 = run(2)
    p8 = run(8)
    assert p2["update_pull"] < p0["update_pull"], (p2, p0)
    assert p8["update_pull"] <= p2["update_pull"]
    # conservation of updates: flushes still carry every delta eventually
    # (miss/update pushes can only shrink because rows refresh less often)
    assert p8["update_push"] <= p0["update_push"] * 1.5


def test_lfu_exact_counts_beyond_255():
    """LFU keeps EXACT unbounded frequency counts (reference LFUCache,
    src/hetu_cache/src/lfu_cache.cc:43-71). Adversarial stream for the
    old 255-capped counter: key 1 is touched 300 times, key 2 reaches
    the cap and is then touched MORE RECENTLY — a capped counter ties
    them at 255 and evicts by recency (victim = 1, wrong); exact counts
    keep freq(1)=300 > freq(2)=262 and evict 2."""
    batches = [[1, 2]] * 260          # both reach ~260 touches together
    batches += [[1, 1]] * 40          # key 1 pulls ahead: freq ~300
    batches += [[2, 2]]               # key 2 touched last (most recent)
    batches += [[3, 4], [5, 6]]       # fill the 4-row cache: {1,2} + 2 of
    batches += [[7, 3]]               # {3,4,5,6} evictions begin: the
    # min-freq singles go first; keys 1 and 2 must both survive ALL of
    # this (their counts dwarf the singles)
    batches += [[1, 2]]               # -> must be a pure hit (no pulls)
    out = _run_policy("lfu", batches)
    keys, pulls = out[-1]
    np.testing.assert_array_equal(keys, [1, 2])
    assert not pulls.any(), "keys with huge exact counts were evicted"

    # now force a head-to-head eviction between 1 and 2: insert new keys
    # until only ONE of {1, 2} can survive in the 4-row cache is fragile
    # to intermediate states; instead check the relative order directly
    # on a tiny cache of 2 rows
    batches2 = [[1, 2]] * 300         # freq(1)=freq(2)≈300
    batches2 += [[1, 1]] * 5          # freq(1) pulls ahead
    batches2 += [[2, 2]]              # 2 most recent — capped LFU would
    batches2 += [[9, 9]]              # tie 1 and 2 at the cap and evict
    batches2 += [[1, 1]]              # the less-recent key 1
    ids = np.array(batches2, np.int64).reshape(-1, 2)
    pl = CachePlanner(ids, nrank=1, batch_size=1, cache_rows=2,
                      num_shards=1, rows_per_shard=ROWS, epochs=1,
                      n_threads=1, policy="lfu")
    progs = [pl.pop() for _ in range(pl.batch_num)]
    # inserting 9 evicts the true min-freq key 2 (262 < 305), so the
    # final read of key 1 is a HIT; a 255-capped counter evicts 1
    # (recency tie-break) and the final read would miss
    last = progs[-1]
    keys = np.unique(ids[last.assign[0]])
    np.testing.assert_array_equal(keys, [1])
    assert not last.pulls[0][0], \
        "key 1 (highest exact freq) was evicted — counts look capped"
