#!/usr/bin/env python
"""BASELINE config #5: DLRM-style 100M+-row row-sharded table.

The reference's scale story is sharding table ROWS across servers
(`/root/reference/ps-lite/include/ps/partitioner.h:31-123`); its largest
in-repo anchor is 33.7M rows (`wdl_criteo.py:9`). This exercises the
100M+-row regime BASELINE.json names ("multi-host DLRM-style: 100M+ rows
row-sharded over N>=2 hosts, all-to-all exchange") as far as the
environment allows:

  --mode mesh   8-device virtual CPU mesh, comm=hybrid: the full
                scheduled stack (row-sharded table + all-to-all pulls +
                planned flushes + hot-row caches) at rows=100M —
                sizing, planner timing at the 100M key space, exchange
                capacities, memory accounting, overflow==0.
  --mode chip   one real v5e chip: rows=50M x emb 128 bf16 (12.8 GB
                HBM-resident table — a bf16 row narrower than the
                128-lane tile allocates 128 lanes physically, so
                100M x 64 would cost 25.6 GB and OOM), scheduled
                steps, examples/sec.

    python benchmarks/dlrm_scale.py --mode mesh   # canonical artifact:
                                                  # docs/dlrm_scale_report.json
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(msg):
    print(f"[dlrm] {msg}", file=sys.stderr, flush=True)


def run_mesh(rows, steps, batch, dim):
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " --xla_force_host_platform_device_count=8")
    import jax
    jax.config.update("jax_platforms", "cpu")
    return _run(rows, steps, batch, dim, comm="hybrid",
                table_dtype="float32")


def run_chip(rows, steps, batch, dim):
    import jax  # noqa: F401  (the real chip)
    return _run(rows, steps, batch, dim, comm="local",
                table_dtype="bfloat16")


def _run(rows, steps, batch, dim, comm, table_dtype):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from herald_tpu import HeraldConfig
    from herald_tpu.data import synthetic_ctr_data
    from herald_tpu.models import get_model
    from herald_tpu.train.cached import CachedEngine

    jax.config.update("jax_compilation_cache_dir", "/tmp/herald_jax_cache")

    cfg = HeraldConfig(
        model="wdl_criteo", batch_size=batch, embedding_dim=dim,
        comm_mode=comm, learning_rate=0.01,
        table_dtype=jnp.bfloat16 if table_dtype == "bfloat16"
        else np.float32,
        use_cache=True, use_scheduler=True,
        # cache sized ABSOLUTELY (not 10% of 100M = 10M rows x 2W f32,
        # which would dwarf HBM): 2M rows/worker on chip, 64K on the
        # virtual mesh — the DLRM regime is exactly "table >> cache"
        cache_limit_ratio=(2_000_000 if comm == "local" else 65_536)
        / rows)
    model = get_model(cfg.model)
    log(f"rows={rows:,} dim={dim} comm={comm} dtype={table_dtype}")
    eng = CachedEngine(cfg, table_rows=rows)
    nr = max(eng.num_shards, 1)
    n = batch * nr * steps
    t0 = time.perf_counter()
    dense, sparse, labels = synthetic_ctr_data(model.spec, n, seed=0,
                                               num_rows=rows)
    gen_s = time.perf_counter() - t0
    uniq_stream = len(np.unique(sparse))
    log(f"stream: {n:,} samples, {uniq_stream:,} unique ids ({gen_s:.0f}s)")

    t0 = time.perf_counter()
    planner = eng.make_planner(sparse, epochs=1)
    state = eng.init_cached_state(0)
    jax.block_until_ready(state.table)
    init_s = time.perf_counter() - t0

    losses, overflow = [], 0
    plan_us = []
    t0 = time.perf_counter()
    done = 0
    while done < steps:
        st0 = time.perf_counter()
        state, stats = eng.train_epoch_cached(
            state, planner, dense, sparse, labels, steps=8)
        if stats is None:
            break
        losses.extend(np.asarray(stats["loss"], np.float64).tolist())
        overflow += int(np.asarray(stats["overflow"]).sum())
        done += int(stats["loss"].shape[0])
        plan_us.append((time.perf_counter() - st0) * 1e6)
    jax.block_until_ready(state.table)
    train_s = time.perf_counter() - t0
    perf = planner.perf()
    state = eng.sync_cache(state, planner)
    planner.close()

    itemsize = 2 if table_dtype == "bfloat16" else 4
    report = {
        "mode": comm, "rows": rows, "dim": dim, "dtype": table_dtype,
        "devices": nr, "steps": done, "global_batch": batch * nr,
        "overflow_rows": overflow,
        "loss_first": losses[0], "loss_last": losses[-1],
        "loss_finite": bool(np.isfinite(losses).all()),
        "examples_per_sec": round(batch * nr * done / train_s, 1),
        "stream_unique_ids": uniq_stream,
        "sizing": {"U_cap": eng.U_cap, "F_cap": eng.F_cap,
                   "cache_rows_per_worker": eng.cache_rows,
                   "a2a_pull_capacity": eng.exchange.capacity,
                   "a2a_flush_capacity": eng.flush_exchange.capacity,
                   "rows_per_shard": eng.exchange.rows_per_shard},
        "memory_gb": {
            "table": round(rows * dim * itemsize / 1e9, 3),
            "cache": round(nr * eng.cache_rows * 2 * dim * 4 / 1e9, 3),
            "pull_exchange_buffer": round(
                nr * eng.exchange.capacity * nr * dim * 4 / 1e9, 4),
            "flush_exchange_buffer": round(
                nr * eng.flush_exchange.capacity * nr * dim * 4 / 1e9, 4),
        },
        "timing_s": {"datagen": round(gen_s, 1),
                     "init_table": round(init_s, 1),
                     "train": round(train_s, 1)},
        "cache_perf": perf,
    }
    return report


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", choices=["mesh", "chip"], default="mesh")
    ap.add_argument("--rows", type=int, default=None,
                    help="table rows (default: 100M mesh, 50M chip — "
                         "one v5e fits 50M x 128 bf16 = 12.8 GB; an "
                         "explicit over-budget value is your own OOM)")
    ap.add_argument("--steps", type=int, default=48)
    ap.add_argument("--batch-size", type=int, default=None)
    ap.add_argument("--dim", type=int, default=None)
    args = ap.parse_args()
    if args.mode == "mesh":
        rep = run_mesh(args.rows or 100_000_000, args.steps,
                       args.batch_size or 64, args.dim or 8)
    else:
        # dim 128, rows 50M: a bf16 row narrower than the 128-lane tile
        # still allocates 128 lanes physically (bf16[100M,64] costs
        # 25.6 GB, not 12.8 — measured OOM on the 16 GB chip), so the
        # single-chip DLRM anchor is 50M x 128 = 12.8 GB with zero
        # padding waste; 100M+ rows is the MESH leg's regime (sharded).
        # An EXPLICIT --rows is honored verbatim, never rewritten.
        rep = run_chip(args.rows or 50_000_000, args.steps,
                       args.batch_size or 256, args.dim or 128)
    print(json.dumps(rep, indent=2))


if __name__ == "__main__":
    main()
