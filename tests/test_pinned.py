"""Pinned hot tier (HeraldConfig.pinned_rows): replicated hot block updated
by psum — the FAE hot-matrix idea fused into the Herald cached engine.

Contracts under test:
- planner: pinned keys get the OOB slot sentinel, never pull, never appear
  in flush plans, and produce zero cache traffic;
- engine: single-worker cached training with a pinned tier is numerically
  equivalent to the plain engine (exact SGD), and the synced table agrees
  with the hot block;
- multi-worker: the model still learns and pinned rows cut planner traffic.
"""

import numpy as np
import pytest

from herald_tpu.config import HeraldConfig
from herald_tpu.data import synthetic_ctr_data
from herald_tpu.models import get_model
from herald_tpu.sched.planner import CachePlanner
from herald_tpu.train.cached import CachedEngine
from herald_tpu.train.engine import Engine

ROWS = 4096
MODEL = "wdl_criteo"


def _data(n, seed=0):
    model = get_model(MODEL)
    d, s, y = synthetic_ctr_data(model.spec, n, seed=seed, num_rows=ROWS)
    # concentrate traffic on low ids so the pinned tier matters
    s = np.where(np.random.default_rng(seed).random(s.shape) < 0.5,
                 s % 64, s)
    return d, s, y


def test_planner_pinned_contract():
    rng = np.random.default_rng(2)
    NRANK, MBS, T = 4, 16, 8
    n = NRANK * MBS * 10
    PIN = 32
    ids = (rng.zipf(1.8, (n, T)) - 1) % 500
    pl = CachePlanner(ids, nrank=NRANK, batch_size=MBS, cache_rows=MBS * T,
                      num_shards=NRANK, rows_per_shard=125, epochs=1,
                      n_threads=1, pinned_rows=PIN)
    C = pl.cache_rows
    steps = 0
    while True:
        prog = pl.pop()
        if prog is None:
            break
        steps += 1
        for z in range(NRANK):
            batch_ids = ids[prog.assign[z]]
            uniq = np.unique(batch_ids)
            pinned = uniq[uniq < PIN]
            u = len(uniq)
            # pinned keys: OOB slot sentinel + no pull
            sl = prog.slots[z][:u]
            pu = prog.pulls[z][:u]
            pin_pos = np.searchsorted(uniq, pinned)
            assert (sl[pin_pos] == C).all()
            assert not pu[pin_pos].any()
            # pinned keys never flushed
            f = prog.flush_ids[z]
            assert not ((f >= 0) & (f < PIN)).any()
    assert steps == pl.batch_num

    # all-pinned stream -> zero cache traffic
    ids_hot = rng.integers(0, PIN, (n, T))
    pl2 = CachePlanner(ids_hot, nrank=NRANK, batch_size=MBS,
                       cache_rows=MBS * T, num_shards=NRANK,
                       rows_per_shard=125, epochs=1, n_threads=1,
                       pinned_rows=PIN)
    while pl2.pop() is not None:
        pass
    p = pl2.perf()
    assert all(p[k] == 0 for k in ("miss_pull", "miss_push",
                                   "update_pull", "update_push")), p
    pl.close()
    pl2.close()


def test_single_worker_pinned_matches_plain_engine():
    """nrank=1 cached training is exact SGD (local cache always fresh);
    adding the pinned tier must keep it exact."""
    import jax.numpy as jnp
    n = 16 * 12
    dense, sparse, labels = _data(n, seed=3)
    lr = 0.5

    cfg_plain = HeraldConfig(model=MODEL, batch_size=16, embedding_dim=8,
                             comm_mode="local", learning_rate=lr,
                             table_dtype=jnp.float32)
    plain = Engine(cfg_plain, table_rows=ROWS)
    ps = plain.init_state(0)
    for i in range(12):
        lo = i * 16
        ps, _ = plain.train_step(ps, dense[lo:lo + 16],
                                 sparse[lo:lo + 16], labels[lo:lo + 16])

    cfg = HeraldConfig(model=MODEL, batch_size=16, embedding_dim=8,
                       comm_mode="local", learning_rate=lr,
                       table_dtype=jnp.float32, cache_limit_ratio=0.5,
                       pinned_rows=64)
    eng = CachedEngine(cfg, table_rows=ROWS)
    st = eng.init_cached_state(0)
    pl = eng.make_planner(sparse, epochs=1, n_threads=1)
    while True:
        st2 = eng.train_step_cached(st, pl, dense, sparse, labels)
        if st2[1] is None:
            break
        st = st2[0]
    st = eng.sync_cache(st, pl)

    # hot block written back == table rows [0, P)
    hot = np.asarray(st.hot_table, np.float32)
    tab = np.asarray(st.table, np.float32)
    np.testing.assert_allclose(tab[:64], hot, rtol=0, atol=1e-6)

    # identical final tables vs the plain engine (exact SGD both ways)
    np.testing.assert_allclose(tab[:256], np.asarray(ps.table)[:256],
                               rtol=1e-4, atol=1e-5)


def test_multiworker_pinned_learns_and_cuts_traffic():
    import jax
    if jax.device_count() < 8:
        pytest.skip("needs 8 virtual devices")
    import jax.numpy as jnp
    n = 8 * 16 * 12
    dense, sparse, labels = _data(n, seed=4)

    def run(pinned):
        cfg = HeraldConfig(model=MODEL, batch_size=16, embedding_dim=8,
                           comm_mode="hybrid", learning_rate=2.0,
                           cache_limit_ratio=0.4, pinned_rows=pinned)
        eng = CachedEngine(cfg, table_rows=ROWS)
        st = eng.init_cached_state(0)
        pl = eng.make_planner(sparse, epochs=2, n_threads=1)
        while True:
            st2, stats = eng.train_step_cached(st, pl, dense, sparse,
                                               labels)
            if stats is None:
                break
            st = st2
            assert int(stats["overflow"]) == 0
        st = eng.sync_cache(st, pl)
        perf = pl.perf()
        res = eng.evaluate(st, dense, sparse, labels)
        pl.close()
        return res, sum(perf[k] for k in ("miss_pull", "miss_push",
                                          "update_pull", "update_push"))

    res_pin, traffic_pin = run(64)
    res_off, traffic_off = run(0)
    assert res_pin["auc"] > 0.6, res_pin
    assert traffic_pin < traffic_off, (traffic_pin, traffic_off)
