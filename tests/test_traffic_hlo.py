"""End-to-end communication accounting on the 8-device mesh.

Pins three facts the traffic story rests on (VERDICT r1 item 1):

1. the bytes the compiled step programs move per collective are EXACTLY
   the analytic capacity model (HLO-measured == ExchangeSpec formula);
2. the scheduled engine, with exchanges sized from the planner's measured
   steady-state owner buckets, compiles to a smaller all-to-all footprint
   than the baseline engine on the same skewed stream;
3. running the full stream through the tight program drops nothing
   (overflow == 0) and the losses stay finite.

Reference analog: the canonical run_laia-vs-run_hetu A/B
(`/root/reference/examples/ctr/tests/run.sh:3-7`) plus the PS byte logging
(`/root/reference/ps-lite/include/ps/worker/PSAgent.h:478-483`).
"""

import numpy as np
import pytest

import jax

from herald_tpu import HeraldConfig
from herald_tpu.data import synthetic_ctr_data
from herald_tpu.models import get_model
from herald_tpu.sched.sizing import (TrafficProfile,
                                     profile_baseline_traffic,
                                     profile_planned_traffic)
from herald_tpu.train.cached import CachedEngine
from herald_tpu.train.engine import Engine
from herald_tpu.utils.hlo_stats import collective_bytes, exchange_a2a_bytes

S = 8
B = 16
ROWS = 32768
EMB = 8
BATCHES = 20
WARMUP = 6


@pytest.fixture(scope="module")
def ab():
    if jax.device_count() < S:
        pytest.skip("needs 8 virtual devices")
    model = get_model("wdl_criteo")
    gb = B * S
    dense, sparse, labels = synthetic_ctr_data(
        model.spec, gb * BATCHES, seed=11, num_rows=ROWS)
    return model, dense, sparse, labels


def test_traffic_ab_end_to_end(ab):
    model, dense, sparse, labels = ab
    gb = B * S
    W = model.emb_width(EMB)

    # ---------------- baseline ----------------
    bprof = profile_baseline_traffic(sparse, B, S)
    cfg_b = HeraldConfig(model="wdl_criteo", batch_size=B,
                         embedding_dim=EMB, comm_mode="hybrid",
                         learning_rate=0.05,
                         a2a_pull_capacity=bprof.pull_capacity())
    eng_b = Engine(cfg_b, table_rows=ROWS)
    st_b = eng_b.init_state(0)
    hlo_b = collective_bytes(eng_b._train_step, st_b,
                             *eng_b.example_step_args())

    # (1) HLO == capacity model: ids (int32) out, vectors (f32) back,
    # grads (f32) out — one exchange
    expect_b = exchange_a2a_bytes(eng_b.exchange, id_bytes=4,
                                  vec_bytes=W * 4, directions=2)
    assert hlo_b["all-to-all"] == expect_b, (hlo_b, expect_b)

    # ---------------- scheduled ----------------
    cfg_s = HeraldConfig(model="wdl_criteo", batch_size=B,
                         embedding_dim=EMB, comm_mode="hybrid",
                         learning_rate=0.05, use_cache=True,
                         cache_limit=int(0.25 * ROWS))
    eng_w = CachedEngine(cfg_s, table_rows=ROWS)     # wide/cold program
    pl1 = eng_w.make_planner(sparse, epochs=1, n_threads=1)
    steps_prof, _ = profile_planned_traffic(pl1, sparse, S)
    pl1.close()
    steady = TrafficProfile.from_steps(steps_prof[WARMUP:])

    cfg_t = HeraldConfig(**{**cfg_s.__dict__,
                            "a2a_pull_capacity": steady.pull_capacity(),
                            "a2a_flush_capacity": steady.flush_capacity()})
    eng_t = CachedEngine(cfg_t, table_rows=ROWS)
    planner = eng_t.make_planner(sparse, epochs=1, n_threads=1)
    st = eng_w.init_cached_state(0)
    hlo_s = collective_bytes(eng_t._cached_step, st,
                             *eng_t.example_step_args())

    # (1) HLO == capacity model: flush exchange (ids + f32 deltas) and
    # pull exchange (ids + f32 vectors), each one direction of data
    expect_s = (exchange_a2a_bytes(eng_t.flush_exchange, id_bytes=4,
                                   vec_bytes=W * 4, directions=1)
                + exchange_a2a_bytes(eng_t.exchange, id_bytes=4,
                                     vec_bytes=W * 4, directions=1))
    assert hlo_s["all-to-all"] == expect_s, (hlo_s, expect_s)

    # (2) the compiled scheduled step moves fewer all-to-all bytes
    assert hlo_s["all-to-all"] < hlo_b["all-to-all"], (hlo_s, hlo_b)

    # (3) run the whole stream: cold steps on the wide program, the rest
    # on the tight one; nothing may overflow
    n_steps = len(steps_prof)
    overflow = 0
    losses = []

    def run_on(eng, k):
        nonlocal st, overflow
        st2, stats = eng.train_epoch_cached(st, planner, dense, sparse,
                                            labels, steps=k)
        losses.extend(np.asarray(stats["loss"]).tolist())
        overflow += int(np.asarray(stats["overflow"]).sum())
        return st2

    st = run_on(eng_w, WARMUP)
    st = run_on(eng_t, n_steps - WARMUP)
    st = eng_w.sync_cache(st, planner)

    assert overflow == 0
    assert len(losses) == n_steps
    assert np.isfinite(losses).all()

    # (4) the reduction is real on this skewed stream, not a rounding
    # artifact (measured ~1.15x affinity-only at these shapes)
    assert hlo_b["all-to-all"] / hlo_s["all-to-all"] > 1.05


def test_parse_handles_async_and_tuples():
    from herald_tpu.utils.hlo_stats import parse_collective_bytes
    txt = """
  %all-to-all = (f32[1,4,8]{2,1,0}, f32[1,4,8]{2,1,0}) all-to-all(%a, %b)
  %gte = f32[1,4,8]{2,1,0} get-tuple-element(%all-to-all), index=0
  %ar-start = f32[16]{0} all-reduce-start(%c), replica_groups={}
  %ar-done = f32[16]{0} all-reduce-done(%ar-start)
  %psum = pred[] all-reduce(%d), to_apply=%region
"""
    out = parse_collective_bytes(txt)
    assert out["all-to-all"] == 2 * 4 * 8 * 4
    assert out["all-reduce"] == 16 * 4 + 1
    assert out["count"]["all-to-all"] == 1
    assert out["count"]["all-reduce"] == 2


def test_eval_uses_wide_exchange_under_tight_train_caps():
    """Evaluation pulls EVERY unique id, so a probe-sized (tight) train
    capacity must not apply to it — eval rides its own worst-case-sized
    exchange and raises loudly if even that overflows."""
    if jax.device_count() < S:
        pytest.skip("needs 8 virtual devices")
    model = get_model("wdl_criteo")
    dense, sparse, labels = synthetic_ctr_data(model.spec, S * B * 4,
                                               seed=2, num_rows=ROWS)
    cfg = HeraldConfig(model="wdl_criteo", batch_size=B, embedding_dim=8,
                       comm_mode="hybrid", a2a_pull_capacity=8)  # tight
    eng = Engine(cfg, table_rows=ROWS)
    assert eng.eval_exchange.capacity > eng.exchange.capacity
    st = eng.init_state(0)
    res = eng.evaluate(st, dense, sparse, labels)
    assert 0.0 <= res["auc"] <= 1.0


def test_int8_flush_halves_the_flush_leg(ab):
    """Compiled-HLO pin of the int8 wire: the flush leg drops from
    S*C*(4 id + 4W f32) to S*C*(4 id + W int8 + 4 scale) — the pull leg
    is untouched. Formula == measured bytes, exactly."""
    import jax.numpy as jnp
    model, dense, sparse, labels = ab
    W = model.emb_width(EMB)

    def compile_bytes(wire):
        cfg = HeraldConfig(model="wdl_criteo", batch_size=B,
                           embedding_dim=EMB, comm_mode="hybrid",
                           learning_rate=0.05, use_cache=True,
                           cache_limit=int(0.25 * ROWS),
                           flush_wire_dtype=wire)
        eng = CachedEngine(cfg, table_rows=ROWS)
        st = eng.init_cached_state(0)
        hlo = collective_bytes(eng._cached_step, st,
                               *eng.example_step_args())
        return eng, hlo["all-to-all"]

    eng_f, got_f32 = compile_bytes(None)
    eng_q, got_int8 = compile_bytes(jnp.int8)
    pull = exchange_a2a_bytes(eng_f.exchange, id_bytes=4,
                              vec_bytes=W * 4, directions=1)
    flush_f32 = exchange_a2a_bytes(eng_f.flush_exchange, id_bytes=4,
                                   vec_bytes=W * 4, directions=1)
    # int8 flush: 4-byte ids + 4-byte per-row scale + W int8 payload
    flush_int8 = exchange_a2a_bytes(eng_q.flush_exchange, id_bytes=8,
                                    vec_bytes=W, directions=1)
    assert got_f32 == pull + flush_f32, (got_f32, pull, flush_f32)
    assert got_int8 == pull + flush_int8, (got_int8, pull, flush_int8)
    # 2.25x at this test's W=8 (fixed id+scale overhead dominates);
    # (4+4W)/(8+W) -> 3.8x at the production W=128
    assert flush_f32 / flush_int8 > 2.0
