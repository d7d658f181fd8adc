#!/usr/bin/env python
"""Exchange-traffic A/B: Herald affinity scheduling vs round-robin.

Herald's end-to-end win is COMMUNICATION, not FLOPs: the lookahead planner
places samples on the worker whose cache already holds their rows and
plans targeted flush/refresh, so all-to-all exchange bytes collapse. This
benchmark runs the SAME cache planner over the same ID stream in both
assignment modes and reports per-step exchanged rows/bytes — the TPU
analog of the reference A/B (`examples/ctr/tests/run.sh`: run_laia vs
run_hetu) and of its cache-perf fixture
(`laia/test/wdl_criteo_cache_perf.txt`).

    python benchmarks/traffic_ab.py [--nrank 8] [--batches 64]

Prints one JSON object per mode plus a reduction summary.
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from herald_tpu.data import DATASETS, synthetic_ctr_data
from herald_tpu.models import get_model
from herald_tpu.sched.planner import CachePlanner


def run_mode(ids, mode, nrank, mbs, cache_rows, rows_per_shard, emb_dim,
             n_threads, pinned=0):
    pl = CachePlanner(ids, nrank=nrank, batch_size=mbs,
                      cache_rows=cache_rows, num_shards=nrank,
                      rows_per_shard=rows_per_shard, epochs=1,
                      n_threads=n_threads,
                      assign_mode="affinity" if mode == "pinned" else mode,
                      pinned_rows=pinned if mode == "pinned" else 0)
    steps = 0
    while pl.pop() is not None:
        steps += 1
    perf = pl.perf()
    phases = pl.phase_times_us()
    plan_us = pl.iter_time_us()
    pl.close()

    pulls = perf["miss_pull"] + perf["update_pull"]      # rows fetched
    pushes = perf["miss_push"] + perf["update_push"]     # rows flushed
    bytes_per_row = emb_dim * 2                          # bf16
    # vanilla per-step all-to-all: every unique batch key pulled AND its
    # grad pushed every step (no cache at all)
    return {
        "mode": mode,
        "steps": steps,
        "rows_pulled_per_worker": int(pulls),
        "rows_pushed_per_worker": int(pushes),
        "exchange_MB_per_worker": round(
            (pulls + pushes) * bytes_per_row / 2**20, 2),
        "plan_time_us_per_batch": int(plan_us),
        "plan_phases_us_per_batch": {k: int(v / max(steps, 1))
                                     for k, v in phases.items()},
        **{k: int(v) for k, v in perf.items()},
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="wdl_criteo")
    ap.add_argument("--nrank", type=int, default=8)
    ap.add_argument("--batch-size", type=int, default=256)
    ap.add_argument("--batches", type=int, default=64)
    ap.add_argument("--embedding-size", type=int, default=128)
    ap.add_argument("--cache-limit-ratio", type=float, default=0.1,
                    help="cache rows as a fraction of unique IDs "
                         "(reference --cache-limit-ratio semantics)")
    ap.add_argument("--threads", type=int, default=None)
    ap.add_argument("--pinned-rows", type=int, default=4096,
                    help="size of the pinned replicated tier for the "
                         "third mode (psum bytes counted separately)")
    args = ap.parse_args()

    model = get_model(args.model)
    rows = model.table_rows
    n = args.nrank * args.batch_size * args.batches
    _, sparse, _ = synthetic_ctr_data(model.spec, n, seed=0, num_rows=rows)
    if args.pinned_rows:
        from herald_tpu.data import frequency_remap
        sparse, _ = frequency_remap(sparse, rows)
    uniq = len(np.unique(sparse))
    cache_rows = max(int(args.cache_limit_ratio * uniq),
                     args.batch_size * model.spec.num_sparse)
    rows_per_shard = (rows + args.nrank - 1) // args.nrank
    threads = args.threads or min(16, os.cpu_count() or 1)

    # no-cache baseline: every step pulls + pushes every unique batch key
    uniq_per_step = np.mean([
        len(np.unique(sparse[i * args.batch_size:(i + 1) * args.batch_size]))
        for i in range(min(args.batches * args.nrank, 64))])
    vanilla_rows = 2 * uniq_per_step * args.batches
    print(json.dumps({"mode": "no-cache all-to-all every step",
                      "rows_exchanged_per_worker": int(vanilla_rows),
                      "exchange_MB_per_worker": round(
                          vanilla_rows * args.embedding_size * 2 / 2**20,
                          2)}))

    results = {}
    for mode in ("roundrobin", "affinity", "pinned"):
        r = run_mode(sparse, mode, args.nrank, args.batch_size, cache_rows,
                     rows_per_shard, args.embedding_size, threads,
                     pinned=args.pinned_rows)
        if mode == "pinned":
            # the pinned tier's own cost: one [P, W] psum per step
            r["pinned_rows"] = args.pinned_rows
            r["psum_MB_per_step"] = round(
                args.pinned_rows * args.embedding_size * 4 / 2**20, 2)
        results[mode] = r
        print(json.dumps(r))

    def rows_of(m):
        return (results[m]["rows_pulled_per_worker"]
                + results[m]["rows_pushed_per_worker"])

    print(json.dumps({
        "summary": "cache exchange traffic (rows/worker/epoch)",
        "affinity_vs_roundrobin": round(
            rows_of("roundrobin") / max(rows_of("affinity"), 1), 3),
        "pinned_vs_affinity": round(
            rows_of("affinity") / max(rows_of("pinned"), 1), 3),
        "affinity_vs_no_cache": round(
            vanilla_rows / max(rows_of("affinity"), 1), 3),
    }))


if __name__ == "__main__":
    main()
