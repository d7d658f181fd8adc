#!/usr/bin/env python
"""Secondary hardware benchmark: engine throughput at an arbitrary config.

BASELINE.md lists extra configs to report beyond the headline bench.py
(wdl b256/e128): dfm_criteo b1024/e512, dcn_criteo, wdl_avazu. This script
measures any of them on the real chip:

    python benchmarks/bench_config.py --model dfm_criteo \
        --batch-size 1024 --embedding-size 512 --rows 8000000

Note: full-Criteo dfm at e512 is a ~35 GB bf16 table — it does not fit one
v5e's 16 GB HBM (the reference holds it in PS host RAM); --rows scales the
table to the single-chip benchmarkable size and is reported in the output.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from herald_tpu import HeraldConfig
from herald_tpu.data import synthetic_ctr_data
from herald_tpu.models import get_model
from herald_tpu.train.engine import Engine


def bench_scheduled(args, cfg, model):
    """Cache-path variant (probe-sized, mirrors bench.py scheduled)."""
    from herald_tpu.sched.sizing import (TrafficProfile,
                                         profile_planned_traffic)
    from herald_tpu.train.cached import CachedEngine
    cfg.use_cache = cfg.use_scheduler = True
    cfg.cache_limit_ratio = args.cache_ratio
    K = args.iters
    dense, sparse, labels = synthetic_ctr_data(
        model.spec, args.batch_size * K, seed=0, num_rows=args.rows)
    dense = dense.astype(np.float32)
    labels = labels.astype(np.float32)
    sparse32 = sparse.astype(np.int32)
    probe_eng = CachedEngine(cfg, table_rows=args.rows)
    probe = probe_eng.make_planner(sparse, epochs=1)
    steps_prof, _ = profile_planned_traffic(probe, sparse, 1)
    probe.close()
    prof = TrafficProfile.from_steps(steps_prof)
    cfg.sched_flush_slots = prof.flush_slots()
    cfg.sched_unique_slots = prof.unique_slots()
    eng = CachedEngine(cfg, table_rows=args.rows)
    epochs = 4
    # chunked dispatch (depth-1 pipeline, same as bench.py/the CLI): the
    # host pops/stages chunk t+1 while the device runs chunk t
    chunk = max(1, min(32, K // 4))
    assert K % chunk == 0, (K, chunk)
    state = eng.init_cached_state(0)
    if args.live:
        # in-situ planner measurement (the pre-tape mode): pop/stage on
        # the loop's critical path, samples gathered host-side
        planner = eng.make_planner(sparse, epochs=epochs)
        times = []
        for _ in range(epochs):
            t0 = time.perf_counter()
            done, stats = 0, None
            while done < K:
                k = min(chunk, K - done)
                state, stats = eng.train_epoch_cached(
                    state, planner, dense, sparse32, labels, steps=k)
                done += k
            float(np.asarray(stats["loss"])[-1])
            times.append(time.perf_counter() - t0)
        planner.close()
        return args.batch_size * K / min(times[1:])
    # production tape mode (mirrors bench.py bench_scheduled): the
    # micro-program tape records once in untimed setup and replays
    # mmap'd; program chunks pre-stage in HBM; the dataset is
    # device-resident — timed epochs are pure dispatch + device work
    import tempfile

    from herald_tpu.sched.replay import plan_cache
    tape_dir = os.path.join(
        tempfile.gettempdir(),
        f"herald_cfg_tape_{args.model}_b{args.batch_size}"
        f"_e{args.embedding_size}_r{args.rows}")
    planner = plan_cache(eng, sparse, tape_dir, epochs=epochs)
    dev_data = eng.stage_dataset(dense, sparse32, labels)
    prestaged = eng.stage_program_chunks(planner, chunk)
    assert len(prestaged) == epochs * (K // chunk), len(prestaged)
    times = []
    for e in range(epochs):
        t0 = time.perf_counter()
        last = None
        for c in range(K // chunk):
            state, last = eng.train_epoch_staged(
                state, prestaged[e * (K // chunk) + c],
                device_data=dev_data)
        float(np.asarray(last["loss"])[-1])
        times.append(time.perf_counter() - t0)
    planner.close()
    return args.batch_size * K / min(times[1:])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="dfm_criteo")
    ap.add_argument("--batch-size", type=int, default=1024)
    ap.add_argument("--embedding-size", type=int, default=512)
    ap.add_argument("--rows", type=int, default=5_000_000)
    ap.add_argument("--iters", type=int, default=64)
    ap.add_argument("--scheduled", action="store_true",
                    help="measure the cache path (planner micro-programs) "
                         "instead of the plain engine")
    ap.add_argument("--live", action="store_true",
                    help="with --scheduled: keep the planner in-situ on "
                         "the timed path instead of the production plan-"
                         "tape + device-resident mode (bench.py parity)")
    ap.add_argument("--platform", default=None,
                    help="force a jax platform (the smoke test pins the "
                         "script on cpu; default: the real chip)")
    ap.add_argument("--cache-ratio", type=float, default=0.1,
                    help="cache_limit_ratio for --scheduled (reference "
                         "canonical 0.1). Size it so the cache covers "
                         "the stream's working set to reach the "
                         "pull-free steady regime — dfm_criteo's "
                         "rows-scaled stream carries ~314K uniques vs "
                         "the 200K rows a 0.1 ratio buys, so it can "
                         "never leave the full flush+pull programs at "
                         "the canonical ratio")
    args = ap.parse_args()
    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    cfg = HeraldConfig(model=args.model, batch_size=args.batch_size,
                       embedding_dim=args.embedding_size,
                       comm_mode="local", table_dtype=jnp.bfloat16)
    model = get_model(cfg.model)
    if args.scheduled:
        eps = bench_scheduled(args, cfg, model)
        print(json.dumps({
            "metric": f"{args.model}_b{args.batch_size}"
                      f"_e{args.embedding_size}_scheduled_eps_per_chip",
            "value": round(eps, 1), "unit": "examples/s",
            "rows": args.rows,
        }))
        return
    eng = Engine(cfg, table_rows=args.rows)
    state = eng.init_state(0)
    K = args.iters
    dense, sparse, labels = synthetic_ctr_data(
        model.spec, args.batch_size * 2 * K, seed=0, num_rows=args.rows)

    def stage(lo, hi):
        return (jax.device_put(dense[lo:hi].astype(np.float32)
                               .reshape(K, args.batch_size, -1)),
                jax.device_put(sparse[lo:hi].astype(np.int32)
                               .reshape(K, args.batch_size, -1)),
                jax.device_put(labels[lo:hi].astype(np.float32)
                               .reshape(K, args.batch_size, -1)))

    n = args.batch_size * K
    c0, c1 = stage(0, n), stage(n, 2 * n)
    state, _ = eng.train_epoch(state, *c0, steps=K)      # compile+warm
    jax.block_until_ready(state.table)
    times = []
    for chunk in (c1, c0, c1):
        t0 = time.perf_counter()
        state, stats = eng.train_epoch(state, *chunk, steps=K)
        float(np.asarray(stats["loss"])[-1])             # forced readback
        times.append(time.perf_counter() - t0)
    eps = args.batch_size * K / float(np.median(times))
    print(json.dumps({
        "metric": f"{args.model}_b{args.batch_size}_e{args.embedding_size}"
                  f"_examples_per_sec_per_chip",
        "value": round(eps, 1),
        "unit": "examples/s",
        "rows": args.rows,
        "us_per_step": round(1e6 * np.median(times) / K, 1),
    }))


if __name__ == "__main__":
    main()
