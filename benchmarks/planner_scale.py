#!/usr/bin/env python
"""Planning-time scaling curve: nrank x global batch size.

VERDICT r1 item 6: the planner must stay ahead of ~ms TPU steps; this
measures per-batch planning time at nrank in {8, 16, 32, 64} (the 64-way
point runs the 128-bit residency-word instantiation) and global batches
up to 16K ids/step, on wdl_criteo-shaped streams (26 tables, Zipf ids).

Reference context: the TopkScheduler was the production answer to the
same bottleneck (`laia/src/topk_scheduler.cc:393-457` thread-parallel
scoring, top-K tables); pass --top-k to measure that mode too.

    python benchmarks/planner_scale.py [--mbs 256] [--batches 8]

One JSON line per configuration. NOTE: this host has one CPU core —
absolute numbers are serialized; the curve shape (per-worker cost) is the
transferable result.
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from herald_tpu.sched.planner import CachePlanner


def measure(nrank, mbs, batches, tables, rows, top_k, threads, seed=0):
    rng = np.random.default_rng(seed)
    n = nrank * mbs * batches
    ids = (rng.zipf(1.2, (n, tables)) - 1) % max(rows // tables, 2)
    ids += (np.arange(tables) * (rows // tables))
    rows = int(ids.max()) + 1
    cache_rows = max(rows // 10, mbs * tables)
    pl = CachePlanner(ids, nrank=nrank, batch_size=mbs,
                      cache_rows=cache_rows, num_shards=nrank,
                      rows_per_shard=(rows + nrank - 1) // nrank,
                      epochs=1, n_threads=threads, top_k=top_k)
    t0 = time.perf_counter()
    steps = 0
    while pl.pop() is not None:
        steps += 1
    wall = time.perf_counter() - t0
    out = {
        "nrank": nrank, "mbs": mbs, "gbs": nrank * mbs,
        "ids_per_step": nrank * mbs * tables,
        "batches": steps, "top_k": top_k,
        "plan_us_per_batch": pl.iter_time_us(),
        "wall_us_per_batch": int(wall / max(steps, 1) * 1e6),
        "phase_us": {k: int(v / max(steps, 1))
                     for k, v in pl.phase_times_us().items()},
    }
    pl.close()
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mbs", type=int, default=256)
    ap.add_argument("--batches", type=int, default=8)
    ap.add_argument("--tables", type=int, default=26)
    ap.add_argument("--rows", type=int, default=2_000_000)
    ap.add_argument("--top-k", type=int, default=0)
    ap.add_argument("--threads", type=int,
                    default=min(16, os.cpu_count() or 1))
    ap.add_argument("--thread-sweep", action="store_true",
                    help="measure n_threads in {1,2,4,8} at each nrank "
                         "(VERDICT r4 #7: the envelope's multi-core "
                         "division must be measured, not extrapolated; "
                         "on a 1-core host the sweep exposes the "
                         "synchronization overhead the division ignores)")
    args = ap.parse_args()
    for nrank in (8, 16, 32, 64):
        if args.thread_sweep:
            for nt in (1, 2, 4, 8):
                r = measure(nrank, args.mbs, args.batches, args.tables,
                            args.rows, args.top_k, nt)
                r["n_threads"] = nt
                print(json.dumps(r), flush=True)
        else:
            r = measure(nrank, args.mbs, args.batches, args.tables,
                        args.rows, args.top_k, args.threads)
            print(json.dumps(r), flush=True)


if __name__ == "__main__":
    main()
