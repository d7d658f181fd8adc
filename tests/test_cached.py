"""Hot-row cache + planner integration tests.

- Single-worker cached training must be numerically identical to plain
  training (no cross-worker staleness exists, so the cache is exact).
- Micro-program replay: a host-side simulator executes every popped
  program and checks the structural invariants the device relies on
  (slot/key consistency, flush-before-overwrite) plus **gradient
  conservation**: with one virtual unit-gradient per read, the final owner
  values must equal each key's total read count — no update lost or
  double-applied, even under staleness.
- Multi-worker cached hybrid training must learn (AUC) with zero overflow
  and zero deferred flushes.
"""

import numpy as np
import pytest

from herald_tpu import HeraldConfig
from herald_tpu.data import synthetic_ctr_data
from herald_tpu.models import get_model
from herald_tpu.train.cached import CachedEngine
from herald_tpu.train.engine import Engine

ROWS = 2000
B = 32


def _data(n, seed=5):
    model = get_model("wdl_criteo")
    return synthetic_ctr_data(model.spec, n, seed=seed, num_rows=ROWS)


@pytest.mark.parametrize("policy", ["lru", "lfu", "lfuopt"])
def test_cached_single_worker_exact(policy):
    cfg = HeraldConfig(model="wdl_criteo", batch_size=B, embedding_dim=8,
                       comm_mode="local", learning_rate=0.1,
                       cache_limit_ratio=1.0, cache_policy=policy)
    dense, sparse, labels = _data(B * 8)

    ec = CachedEngine(cfg, table_rows=ROWS)
    pl = ec.make_planner(sparse, epochs=1, n_threads=1)
    sc = ec.init_cached_state(0)
    closs = []
    for _ in range(pl.batch_num):
        sc, stats = ec.train_step_cached(sc, pl, dense, sparse, labels)
        closs.append(float(stats["loss"]))
        assert int(stats["overflow"]) == 0
    sc = ec.sync_cache(sc, pl)

    eu = Engine(HeraldConfig(model="wdl_criteo", batch_size=B,
                             embedding_dim=8, comm_mode="local",
                             learning_rate=0.1), table_rows=ROWS)
    su = eu.init_state(0)
    uloss = []
    for t in range(8):
        sl = slice(t * B, (t + 1) * B)
        su, stats = eu.train_step(su, dense[sl], sparse[sl], labels[sl])
        uloss.append(float(stats["loss"]))
    np.testing.assert_allclose(closs, uloss, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(sc.table), np.asarray(su.table),
                               rtol=1e-4, atol=1e-6)


def test_cached_small_cache_still_exact_single_worker():
    """Thrashing cache (evictions every step) must still be exact for a
    single worker: eviction flushes + final sync lose nothing."""
    cfg = HeraldConfig(model="wdl_criteo", batch_size=B, embedding_dim=8,
                       comm_mode="local", learning_rate=0.1,
                       cache_limit=900)   # just above one batch's uniques -> heavy eviction
    dense, sparse, labels = _data(B * 6, seed=6)
    ec = CachedEngine(cfg, table_rows=ROWS)
    pl = ec.make_planner(sparse, epochs=1, n_threads=1)
    sc = ec.init_cached_state(0)
    for _ in range(pl.batch_num):
        sc, stats = ec.train_step_cached(sc, pl, dense, sparse, labels)
    sc = ec.sync_cache(sc, pl)
    perf = pl.perf()
    assert perf["miss_push"] > 0            # evictions actually happened
    assert perf["deferred_flush"] == 0

    eu = Engine(HeraldConfig(model="wdl_criteo", batch_size=B,
                             embedding_dim=8, comm_mode="local",
                             learning_rate=0.1), table_rows=ROWS)
    su = eu.init_state(0)
    for t in range(6):
        sl = slice(t * B, (t + 1) * B)
        su, _ = eu.train_step(su, dense[sl], sparse[sl], labels[sl])
    np.testing.assert_allclose(np.asarray(sc.table), np.asarray(su.table),
                               rtol=1e-4, atol=1e-6)


@pytest.mark.parametrize("cache_rows,owner_cap", [(250, None), (2000, None),
                                                  (2000, 2)])
def test_program_replay_invariants_and_conservation(cache_rows, owner_cap):
    """Replay planner micro-programs on a host simulator (4 workers).

    owner_cap=2 runs the tight planned-flush budget (sched_flush_budget):
    deferral is active, so additionally pin that conservation still
    holds — a deferred delta is never lost, it just flushes later (fair
    rotation under the budget is pinned separately by
    test_tight_budget_rotates_planned_flushes)."""
    nrank, mbs = 4, 8
    model = get_model("wdl_criteo")
    _, sparse, _ = synthetic_ctr_data(model.spec, nrank * mbs * 10, seed=7,
                                      num_rows=ROWS)
    cfg = HeraldConfig(model="wdl_criteo", batch_size=mbs, embedding_dim=8,
                       comm_mode="local", cache_limit=cache_rows)
    eng = CachedEngine(cfg, table_rows=ROWS)
    # planner as the 4-worker scheduler regardless of local engine
    from herald_tpu.sched.planner import CachePlanner
    kw = {} if owner_cap is None else {"owner_cap": owner_cap}
    pl = CachePlanner(sparse, nrank=nrank, batch_size=mbs,
                      cache_rows=cache_rows, num_shards=1,
                      rows_per_shard=ROWS, epochs=1, n_threads=1, **kw)

    C = cache_rows
    slot_key = [dict() for _ in range(nrank)]       # slot -> resident key
    delta = [dict() for _ in range(nrank)]          # slot -> pending grads
    owner = {}                                      # key -> applied grads
    reads = {}                                      # key -> total reads
    n_steps = 0
    while True:
        prog = pl.pop()
        if prog is None:
            break
        n_steps += 1
        for z in range(nrank):
            # phase 1: flushes read deltas BEFORE this step's inserts
            for fid, fslot in zip(prog.flush_ids[z], prog.flush_slots[z]):
                if fid < 0:
                    continue
                assert slot_key[z].get(int(fslot)) == int(fid), \
                    f"flush slot/key mismatch step {n_steps} w{z}"
                owner[int(fid)] = owner.get(int(fid), 0) + \
                    delta[z].pop(int(fslot), 0)
            # phases 2-5: reads
            keys = np.unique(sparse[prog.assign[z]])
            u = len(keys)
            assert (prog.slots[z][u:] == C).all()   # padding sentinel
            used = set()
            for q, key in enumerate(keys):
                s = int(prog.slots[z][q])
                assert 0 <= s < C
                assert s not in used                 # distinct slots
                used.add(s)
                if prog.pulls[z][q]:
                    slot_key[z][s] = int(key)        # insert/refresh
                else:
                    assert slot_key[z].get(s) == int(key), \
                        f"hit points at wrong resident step {n_steps}"
                delta[z][s] = delta[z].get(s, 0) + 1
                reads[int(key)] = reads.get(int(key), 0) + 1
    assert n_steps == pl.batch_num
    perf = pl.perf()
    if owner_cap is None:
        assert perf["deferred_flush"] == 0
    else:
        # deferral active: every invariant above (slot/key agreement,
        # distinct slots, padding) held, and conservation below closes
        # the loop — a deferred delta is never lost, it flushes later.
        # (Fair rotation under the budget is pinned separately by
        # test_tight_budget_rotates_planned_flushes.)
        assert perf["deferred_flush"] > 0, "budget never bound: test inert"
    # final sync
    for z in range(nrank):
        ids_z, slots_z = pl.dirty_rows(z)
        for fid, fslot in zip(ids_z, slots_z):
            assert slot_key[z].get(int(fslot)) == int(fid)
            owner[int(fid)] = owner.get(int(fid), 0) + \
                delta[z].pop(int(fslot), 0)
    assert owner == reads, "gradient conservation violated"


def test_cached_hybrid_learns():
    cfg = HeraldConfig(model="wdl_criteo", batch_size=16, embedding_dim=16,
                       comm_mode="hybrid", learning_rate=2.0,
                       cache_limit_ratio=0.3)
    dense, sparse, labels = _data(8 * 16 * 16, seed=8)
    eng = CachedEngine(cfg, table_rows=ROWS)
    assert eng.num_shards == 8
    state = eng.init_cached_state(0)
    pl = eng.make_planner(sparse, epochs=3, n_threads=2)
    losses = []
    for _ in range(pl.batch_num * 3):
        state, stats = eng.train_step_cached(state, pl, dense, sparse,
                                             labels)
        if stats is None:
            break
        losses.append(float(stats["loss"]))
        assert int(stats["overflow"]) == 0
    assert np.isfinite(losses).all()
    assert pl.perf()["deferred_flush"] == 0
    state = eng.sync_cache(state, pl)
    res = eng.evaluate(state, dense, sparse, labels)
    assert res["auc"] > 0.6, res


def test_cached_epoch_matches_steps():
    cfg = HeraldConfig(model="wdl_criteo", batch_size=B, embedding_dim=8,
                       comm_mode="local", learning_rate=0.1,
                       cache_limit=900)
    dense, sparse, labels = _data(B * 6, seed=9)

    e1 = CachedEngine(cfg, table_rows=ROWS)
    p1 = e1.make_planner(sparse, epochs=1, n_threads=1)
    s1 = e1.init_cached_state(0)
    losses1 = []
    for _ in range(p1.batch_num):
        s1, st = e1.train_step_cached(s1, p1, dense, sparse, labels)
        losses1.append(float(st["loss"]))

    e2 = CachedEngine(cfg, table_rows=ROWS)
    p2 = e2.make_planner(sparse, epochs=1, n_threads=1)
    s2 = e2.init_cached_state(0)
    s2, stats = e2.train_epoch_cached(s2, p2, dense, sparse, labels,
                                      steps=p2.batch_num)
    np.testing.assert_allclose(np.asarray(stats["loss"]), losses1,
                               rtol=1e-5)
    np.testing.assert_allclose(np.asarray(s1.table), np.asarray(s2.table),
                               rtol=1e-5, atol=1e-7)


def test_steady_state_traffic_is_update_dominated():
    """BASELINE.md fixture-shape check (laia/test/wdl_criteo_cache_perf.txt):
    once caches are warm on a reuse-heavy stream, traffic must be dominated
    by planned update pushes/refreshes, not cold misses — the signature of
    the Herald planned-refresh design."""
    from herald_tpu.sched.planner import CachePlanner
    rng = np.random.default_rng(11)
    NRANK, MBS, T = 8, 16, 8
    ROWS = 2000
    n = NRANK * MBS * 60
    ids = (rng.zipf(2.0, (n, T)) - 1) % (ROWS // T)
    ids += np.arange(T) * (ROWS // T)
    pl = CachePlanner(ids, nrank=NRANK, batch_size=MBS,
                      cache_rows=4 * MBS * T, num_shards=NRANK,
                      rows_per_shard=(ROWS + NRANK - 1) // NRANK,
                      epochs=1, n_threads=1)
    # consume the warmup half, snapshot, then the steady half
    half = pl.batch_num // 2
    for _ in range(half):
        assert pl.pop() is not None
    warm = pl.perf()
    while pl.pop() is not None:
        pass
    done = pl.perf()
    steady = {k: done[k] - warm[k] for k in done}
    pl.close()
    update_traffic = steady["update_pull"] + steady["update_push"]
    miss_traffic = steady["miss_pull"] + steady["miss_push"]
    assert update_traffic > miss_traffic, steady


def test_bf16_flush_wire_close_to_exact():
    """Compressed flush (bf16 deltas on the wire, f32 accumulation):
    per-flush quantization only — the final table stays close to the
    exact-f32-flush run and the plain engine."""
    import jax
    import jax.numpy as jnp
    if jax.device_count() < 8:
        pytest.skip("needs 8 virtual devices")
    model = get_model("wdl_criteo")
    n = 8 * 8 * 10
    dense, sparse, labels = synthetic_ctr_data(model.spec, n, seed=13,
                                               num_rows=ROWS)

    def run(wire):
        cfg = HeraldConfig(model="wdl_criteo", batch_size=8,
                           embedding_dim=8, comm_mode="hybrid",
                           learning_rate=0.5, cache_limit_ratio=0.5,
                           flush_wire_dtype=wire)
        eng = CachedEngine(cfg, table_rows=ROWS)
        pl = eng.make_planner(sparse, epochs=1, n_threads=1)
        st = eng.init_cached_state(0)
        st, stats = eng.train_epoch_cached(st, pl, dense, sparse, labels,
                                           steps=10)
        assert int(np.asarray(stats["overflow"]).sum()) == 0
        st = eng.sync_cache(st, pl)
        pl.close()
        return np.asarray(st.table, np.float32)

    exact = run(None)
    compressed = run(jnp.bfloat16)
    # bf16 has ~3 decimal digits; deltas are O(lr*grad) ~ 1e-2
    err = np.abs(exact - compressed).max()
    assert 0 < err < 5e-3, err   # differs (compression real), but tightly


def test_cached_adagrad_embed_optimizer_learns():
    """Non-SGD embedding optimizer through the cache machinery: slots ride
    the flush path to the owner shard (reference: server-side ApplySparse,
    ps-lite/include/ps/server/optimizer.h), while the local optimistic
    update stays an SGD-style preview (reference Line::accumulate). Smoke
    + convergence, not exactness (the preview approximates)."""
    import jax
    if jax.device_count() < 8:
        pytest.skip("needs 8 virtual devices")
    model = get_model("wdl_criteo")
    n = 8 * 16 * 12
    dense, sparse, labels = synthetic_ctr_data(model.spec, n, seed=17,
                                               num_rows=ROWS)
    cfg = HeraldConfig(model="wdl_criteo", batch_size=16, embedding_dim=8,
                       comm_mode="hybrid", learning_rate=1.0,
                       embed_optimizer="adagrad", embed_learning_rate=0.5,
                       cache_limit_ratio=0.5, pinned_rows=16)
    eng = CachedEngine(cfg, table_rows=ROWS)
    assert eng.embed_opt.name == "adagrad"
    assert "accum" in eng.embed_opt.slot_names
    pl = eng.make_planner(sparse, epochs=3, n_threads=1)
    st = eng.init_cached_state(0)
    slots0 = {k: np.asarray(v).copy()
              for k, v in st.table_slots.items()}
    while True:
        st2 = eng.train_epoch_cached(st, pl, dense, sparse, labels,
                                     steps=12)
        if st2[1] is None:
            break
        st = st2[0]
        assert int(np.asarray(st2[1]["overflow"]).sum()) == 0
    st = eng.sync_cache(st, pl)
    pl.close()
    # optimizer slots actually accumulated on the owner shards
    for k in slots0:
        assert np.abs(np.asarray(st.table_slots[k]) - slots0[k]).max() > 0
    # hot-tier slots too (sharded adagrad state)
    for k in st.hot_slots:
        assert np.abs(np.asarray(st.hot_slots[k])).max() > 0
    res = eng.evaluate(st, dense, sparse, labels)
    assert res["auc"] > 0.6, res


def test_tight_budget_rotates_planned_flushes():
    """Oldest-first deferral is fair: under a planned-flush budget of 1
    per owner per step, a crafted stream where two workers alternately
    write/read the same 26-key block must see the flushes ROTATE through
    the block (each flushed key re-dirties youngest and goes to the back
    of the queue). Key-ordered emission — the old rule — would emit the
    lowest key every time and starve the rest into unbounded staleness."""
    from herald_tpu.sched.planner import CachePlanner
    nrank, mbs, T = 2, 4, 26              # wdl_criteo has 26 sparse tables
    batches = 40
    gb = nrank * mbs
    A = np.arange(10, 10 + T)             # w0's home block
    B = np.arange(50, 50 + T)             # w1's home block
    C_blk = np.arange(90, 90 + T)         # w0's off-batch filler
    sparse = np.zeros((gb * batches, T), np.int64)
    for t in range(batches):
        for j in range(gb):
            z = j % nrank                 # round-robin assignment
            if z == 0:
                row = A if t % 2 == 0 else C_blk
            else:
                row = B if t % 2 == 0 else A
            sparse[t * gb + j] = row
    # odd batches: w1 reads A while A is dirty at w0 and absent from
    # w0's batch -> planned-flush candidates are exactly w0's A block
    pl = CachePlanner(sparse, nrank=nrank, batch_size=mbs, cache_rows=512,
                      num_shards=1, rows_per_shard=1024, epochs=1,
                      n_threads=1, owner_cap=1, assign_mode="roundrobin")
    flushed_A = set()
    w0_flush_events = 0
    n = 0
    while True:
        prog = pl.pop()
        if prog is None:
            break
        n += 1
        fids = prog.flush_ids[0]
        for fid in fids[fids >= 0]:
            if int(fid) in set(A.tolist()):
                flushed_A.add(int(fid))
                w0_flush_events += 1
    assert n == batches
    assert pl.perf()["deferred_flush"] > 0, "budget never bound"
    # ~one w0 flush per odd batch; rotation must cover most of the block
    # (key-order coverage would be ~1-3 keys)
    assert w0_flush_events >= 10, w0_flush_events
    assert len(flushed_A) >= min(w0_flush_events, 15), \
        (len(flushed_A), w0_flush_events)


def test_device_resident_data_path_exact():
    """train_epoch_cached(device_data=stage_dataset(...)) — on-device
    index gathers from HBM-resident samples — is bit-equivalent to the
    host-staged path, in local AND hybrid modes."""
    for comm in ("local", "hybrid"):
        cfg = HeraldConfig(model="wdl_criteo", batch_size=B,
                           embedding_dim=8, comm_mode=comm,
                           learning_rate=0.1, cache_limit=900)
        dense, sparse, labels = _data(
            B * 6 * (8 if comm == "hybrid" else 1), seed=11)

        e1 = CachedEngine(cfg, table_rows=ROWS)
        p1 = e1.make_planner(sparse, epochs=1, n_threads=1)
        s1 = e1.init_cached_state(0)
        s1, st1 = e1.train_epoch_cached(s1, p1, dense, sparse, labels,
                                        steps=p1.batch_num)

        e2 = CachedEngine(cfg, table_rows=ROWS)
        p2 = e2.make_planner(sparse, epochs=1, n_threads=1)
        s2 = e2.init_cached_state(0)
        dev = e2.stage_dataset(dense, sparse, labels)
        s2, st2 = e2.train_epoch_cached(s2, p2, None, None, None,
                                        steps=p2.batch_num,
                                        device_data=dev)
        np.testing.assert_array_equal(np.asarray(st1["loss"]),
                                      np.asarray(st2["loss"]))
        np.testing.assert_array_equal(np.asarray(s1.table),
                                      np.asarray(s2.table))
        np.testing.assert_array_equal(np.asarray(s1.cache),
                                      np.asarray(s2.cache))


def test_int8_flush_wire_error_feedback():
    """int8 flush (per-row scales + exact error feedback): the final
    table stays close to the exact run, the quantization residual rides
    the delta accumulator (cache delta half is NOT zero right after an
    int8 flush unless the delta quantized exactly), and the identity
    delta == q*scale + residual is bit-exact."""
    import jax
    import jax.numpy as jnp
    from herald_tpu.parallel.exchange import rowquant_int8
    if jax.device_count() < 8:
        pytest.skip("needs 8 virtual devices")

    # unit contract of the quantizer itself
    rng = np.random.default_rng(21)
    x = jnp.asarray(rng.normal(size=(37, 16)).astype(np.float32)
                    * rng.exponential(size=(37, 1)).astype(np.float32))
    x = x.at[5].set(0.0)                      # zero row -> scale 1 path
    q, sc = rowquant_int8(x)
    assert q.dtype == jnp.int8 and sc.dtype == jnp.float32
    deq = np.asarray(q, np.float32) * np.asarray(sc)[:, None]
    res = np.asarray(x) - deq
    np.testing.assert_array_equal(np.asarray(x), deq + res)  # exact EF
    assert np.abs(res).max() <= (np.asarray(sc).max() / 2) + 1e-7
    assert np.abs(deq[5]).max() == 0.0

    model = get_model("wdl_criteo")
    n = 8 * 8 * 10
    dense, sparse, labels = synthetic_ctr_data(model.spec, n, seed=13,
                                               num_rows=ROWS)

    def run(wire):
        cfg = HeraldConfig(model="wdl_criteo", batch_size=8,
                           embedding_dim=8, comm_mode="hybrid",
                           learning_rate=0.5, cache_limit_ratio=0.5,
                           flush_wire_dtype=wire)
        eng = CachedEngine(cfg, table_rows=ROWS)
        pl = eng.make_planner(sparse, epochs=1, n_threads=1)
        st = eng.init_cached_state(0)
        st, stats = eng.train_epoch_cached(st, pl, dense, sparse, labels,
                                           steps=10)
        assert int(np.asarray(stats["overflow"]).sum()) == 0
        st = eng.sync_cache(st, pl)
        pl.close()
        return np.asarray(st.table, np.float32)

    exact = run(None)
    compressed = run(jnp.int8)
    err = np.abs(exact - compressed).max()
    # int8 + error feedback: differs (compression real) but bounded —
    # each applied flush is off by at most one quantization step of a
    # delta that is O(lr * grad)
    assert 0 < err < 5e-3, err


def test_int8_flush_conserves_gradient_mass():
    """Error feedback conservation: over a run, (what the owner applied)
    + (residual still parked in cache deltas) == the exact-f32 deltas —
    checked end-to-end by comparing the synced int8 table against the
    exact table when every flushed row's residual has been re-flushed
    (train long enough on a reuse-heavy stream and sync at the end, so
    the only surviving discrepancy is the last unflushed residual,
    bounded by one quantization step)."""
    import jax
    import jax.numpy as jnp
    if jax.device_count() < 8:
        pytest.skip("needs 8 virtual devices")
    model = get_model("wdl_criteo")
    # small id space -> heavy reuse -> many flushes of the same rows
    # (cache_rows = rows/2 must still exceed U_cap = 8 x 26 = 208)
    rows = 600
    n = 8 * 8 * 16
    dense, sparse, labels = synthetic_ctr_data(model.spec, n, seed=23,
                                               num_rows=rows)

    def run(wire, lr):
        cfg = HeraldConfig(model="wdl_criteo", batch_size=8,
                           embedding_dim=8, comm_mode="hybrid",
                           learning_rate=lr, cache_limit_ratio=0.5,
                           flush_wire_dtype=wire)
        eng = CachedEngine(cfg, table_rows=rows)
        pl = eng.make_planner(sparse, epochs=1, n_threads=1)
        st = eng.init_cached_state(0)
        st, stats = eng.train_epoch_cached(st, pl, dense, sparse, labels,
                                           steps=16)
        assert int(np.asarray(stats["overflow"]).sum()) == 0
        st = eng.sync_cache(st, pl)
        pl.close()
        return np.asarray(st.table, np.float32)

    # at lr=0 every delta is exactly 0 -> int8 path must be EXACT
    np.testing.assert_array_equal(run(jnp.int8, 0.0), run(None, 0.0))
    # at lr>0 the drift must shrink when residuals get re-flushed more:
    # compare against a deliberately coarse no-EF bound (one-step quant
    # error per flush would accumulate linearly; EF keeps it ~one step)
    exact = run(None, 0.5)
    ef = run(jnp.int8, 0.5)
    assert np.abs(exact - ef).max() < 5e-3


def test_rowquant_int8_extreme_magnitudes():
    """Quantizer robustness across 60 orders of magnitude: q stays in
    [-127, 127], dequant+residual reconstructs exactly (f32 EF identity),
    zero rows take the scale-1 path, and no inf/nan appears."""
    import jax.numpy as jnp
    from herald_tpu.parallel.exchange import rowquant_int8
    rng = np.random.default_rng(77)
    base = rng.normal(size=(64, 16)).astype(np.float32)
    mags = np.float32(10.0) ** rng.integers(-30, 31, size=(64, 1))
    x = jnp.asarray(base * mags)
    x = x.at[0].set(0.0)
    x = x.at[1].set(np.float32(1e-38))     # near-subnormal row
    q, sc = rowquant_int8(x)
    qn, scn = np.asarray(q, np.int64), np.asarray(sc)
    assert np.abs(qn).max() <= 127
    assert np.isfinite(scn).all() and (scn > 0).all()
    deq = qn.astype(np.float32) * scn[:, None]
    res = np.asarray(x) - deq
    assert np.isfinite(res).all()
    np.testing.assert_array_equal(np.asarray(x), deq + res)
    assert np.abs(deq[0]).max() == 0.0
