#!/usr/bin/env python
"""Decompose the single-chip scheduled-path step cost (bench_scheduled
config) into host and device components:

  1. planner pop_chunk        (C planner queue drain, includes plan time
                               on this 1-core host)
  2. numpy assignment gather  (raw_dense[idx] etc.)
  3. device_put               (host->device staging through the tunnel)
  4. device scan              (_cached_epoch with pre-staged args)
  5. plain-engine device scan (same data, base Engine) for the delta

Prints one JSON line with per-step milliseconds for each phase.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/herald_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from herald_tpu import HeraldConfig
from herald_tpu.data import DATASETS, synthetic_ctr_data
from herald_tpu.models import get_model
from herald_tpu.sched.sizing import TrafficProfile, profile_planned_traffic
from herald_tpu.train.cached import CachedEngine

BATCH = 256
EMB_DIM = 128
ROWS = DATASETS["criteo"].num_embed_rows
ITERS = 256


def log(m):
    print(m, file=sys.stderr, flush=True)


def main():
    cfg = HeraldConfig(model="wdl_criteo", batch_size=BATCH,
                       embedding_dim=EMB_DIM, comm_mode="local",
                       learning_rate=0.01, table_dtype=jnp.bfloat16,
                       use_cache=True, use_scheduler=True,
                       cache_limit_ratio=0.1)
    model = get_model(cfg.model)
    dense, sparse, labels = synthetic_ctr_data(
        model.spec, BATCH * ITERS, seed=0, num_rows=ROWS)
    dense = dense.astype(np.float32)
    labels = labels.astype(np.float32)
    sparse32 = sparse.astype(np.int32)

    log("[prof] probe sizing ...")
    probe_eng = CachedEngine(cfg, table_rows=ROWS)
    probe = probe_eng.make_planner(sparse, epochs=1)
    steps_prof, _ = profile_planned_traffic(probe, sparse, 1)
    probe.close()
    prof = TrafficProfile.from_steps(steps_prof)
    cfg.sched_flush_slots = prof.flush_slots()
    cfg.sched_unique_slots = prof.unique_slots()
    log(f"[prof] U_cap={cfg.sched_unique_slots} F_cap={cfg.sched_flush_slots}")

    eng = CachedEngine(cfg, table_rows=ROWS)

    # ---- phase 1: planner pop_chunk (fresh planner, drain 256 programs)
    t0 = time.perf_counter()
    planner = eng.make_planner(sparse, epochs=1)
    (K, assign, slots, pulls, fids, fslots,
     pfids, pfslots, uniq, inv) = planner.pop_chunk(ITERS)
    t_pop = time.perf_counter() - t0
    assert K == ITERS, K
    ptimes = planner.phase_times_us()
    planner.close()
    log(f"[prof] pop_chunk: {t_pop*1e3:.1f} ms total "
        f"({t_pop/ITERS*1e3:.3f} ms/step), planner phases {ptimes}")

    # ---- phase 2: numpy gathers
    idx = assign[:K]
    t0 = time.perf_counter()
    d_np = dense[idx]
    s_np = sparse32[idx]
    y_np = labels[idx]
    t_gather = time.perf_counter() - t0
    ident = bool(np.array_equal(idx.reshape(-1),
                                np.arange(idx.size, dtype=idx.dtype)))
    log(f"[prof] numpy gather: {t_gather*1e3:.1f} ms "
        f"(assign==arange: {ident})")

    # ---- phase 3: device_put of everything one epoch needs
    def put_all():
        out = (eng._put(d_np, np.float32, stacked=True),
               eng._put(s_np, np.int32, stacked=True),
               eng._put(y_np, np.float32, stacked=True),
               eng._put(slots[:K], np.int32, stacked=True),
               eng._put(pulls[:K].view(bool), bool, stacked=True),
               eng._put(fids[:K], np.int32, stacked=True),
               eng._put(fslots[:K], np.int32, stacked=True),
               eng._put(pfids[:K], np.int32, stacked=True),
               eng._put(pfslots[:K], np.int32, stacked=True))
        jax.block_until_ready(out)
        return out

    t0 = time.perf_counter()
    staged = put_all()
    t_put = time.perf_counter() - t0
    nbytes = sum(a.nbytes for a in staged)
    log(f"[prof] device_put: {t_put*1e3:.1f} ms ({nbytes/1e6:.1f} MB, "
        f"{nbytes/1e6/max(t_put,1e-9):.0f} MB/s)")
    t0 = time.perf_counter()
    staged2 = put_all()
    t_put2 = time.perf_counter() - t0
    log(f"[prof] device_put (2nd): {t_put2*1e3:.1f} ms")

    # ---- phase 4: device-only scan
    state = eng.init_cached_state(0)
    log("[prof] compiling cached epoch ...")
    state, stats = eng._cached_epoch(state, *staged)
    float(np.asarray(stats["loss"])[-1])
    times = []
    for i in range(3):
        s_in = staged2 if i % 2 == 0 else staged
        t0 = time.perf_counter()
        state, stats = eng._cached_epoch(state, *s_in)
        float(np.asarray(stats["loss"])[-1])
        times.append(time.perf_counter() - t0)
    t_dev = min(times)
    log(f"[prof] device scan: {[f'{t*1e3:.0f}' for t in times]} ms "
        f"-> {t_dev/ITERS*1e3:.3f} ms/step")

    # optional: a profiler trace of one scan call for op-level analysis
    if "--trace" in sys.argv:
        with jax.profiler.trace("/tmp/herald_trace"):
            state, stats = eng._cached_epoch(state, *staged2)
            float(np.asarray(stats["loss"])[-1])
        log("[prof] trace written to /tmp/herald_trace")

    out = {
        "pop_ms_per_step": round(t_pop / ITERS * 1e3, 3),
        "gather_ms_per_step": round(t_gather / ITERS * 1e3, 3),
        "put_ms_per_step": round(min(t_put, t_put2) / ITERS * 1e3, 3),
        "device_ms_per_step": round(t_dev / ITERS * 1e3, 3),
        "staged_mb_per_epoch": round(nbytes / 1e6, 1),
        "assign_is_arange": ident,
        "U_cap": eng.U_cap, "F_cap": eng.F_cap,
        "planner_phase_us": ptimes,
    }
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
