"""GCN communication A/B: exchange pull vs reference-style broadcast.

The reference's DistGCN_15d moves the FULL activation table to every
worker each layer (staged broadcasts, `gpu_ops/DistGCN_15d.py:19-70`) —
N x F' bytes per device per layer regardless of the edge structure. The
herald_tpu design pulls only the deduplicated rows local edges actually
reference. This script compiles both on the 8-device mesh and reads the
actual collective bytes off the optimized HLO (same methodology as
benchmarks/mesh_ab.py), plus wall-clock per step.

Usage: python benchmarks/gnn_ab.py [--nodes 20000] [--degree 16]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8")
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
from jax.sharding import Mesh  # noqa: E402

from herald_tpu.gnn import GCN, GCNConfig, synthetic_sbm  # noqa: E402
from herald_tpu.utils.hlo_stats import (  # noqa: E402
    compiled_text, parse_collective_bytes,
)


def measure(m: GCN, steps: int = 20):
    hlo = compiled_text(m._step, m.params, *m._data)
    bytes_by_kind = parse_collective_bytes(hlo)
    m.train_step()  # compile + warm
    t0 = time.perf_counter()
    for _ in range(steps):
        loss, ovf = m.train_step()
    dt = (time.perf_counter() - t0) / steps
    return bytes_by_kind, dt, loss, ovf


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nodes", type=int, default=20000)
    ap.add_argument("--degree", type=float, default=16.0,
                    help="mean degree of the SBM graph")
    ap.add_argument("--classes", type=int, default=8)
    ap.add_argument("--feat-dim", type=int, default=64)
    ap.add_argument("--hidden", type=int, default=64)
    ap.add_argument("--steps", type=int, default=20)
    args = ap.parse_args()

    n, k = args.nodes, args.classes
    # p_in/p_out chosen for the requested mean degree, 4:1 in:out
    within = n / k
    p_in = args.degree * 0.8 / within
    p_out = args.degree * 0.2 / (n - within)
    g = synthetic_sbm(num_nodes=n, num_classes=k, feat_dim=args.feat_dim,
                      p_in=p_in, p_out=p_out, seed=1)
    mesh = Mesh(np.array(jax.devices()[:8]), ("dp",))
    cfg = GCNConfig(feat_dim=args.feat_dim, hidden_dim=args.hidden,
                    num_classes=k)

    from herald_tpu.gnn import locality_reorder, relabel_graph
    g_re = relabel_graph(g, locality_reorder(g, 8))

    out = {"nodes": n, "edges": int(len(g.src)),
           "mean_degree": round(len(g.src) / n, 1)}
    cases = (("broadcast", g), ("pull", g), ("halo", g),
             ("halo_reorder", g_re))
    for name, graph in cases:
        mode = "halo" if name == "halo_reorder" else name
        m = GCN(cfg, graph, mesh=mesh, mode=mode)
        by_kind, dt, loss, ovf = measure(m, args.steps)
        counts = by_kind.pop("count", {})
        total = sum(by_kind.values())
        by_kind = {k: v for k, v in by_kind.items() if v}
        by_kind["count"] = counts
        rec = {"mode": name, "collective_bytes": by_kind,
               "total_collective_bytes": total,
               "wall_s_per_step": round(dt, 5), "overflow": int(ovf)}
        if m.plan is not None:
            rec["halo_rows"] = m.plan.halo_rows
        print(json.dumps(rec), flush=True)
        out[f"{name}_bytes"] = total
        out[f"{name}_ms"] = round(dt * 1e3, 2)
    out["halo_vs_broadcast_bytes_reduction"] = round(
        out["broadcast_bytes"] / max(out["halo_bytes"], 1), 3)
    out["halo_reorder_vs_broadcast_bytes_reduction"] = round(
        out["broadcast_bytes"] / max(out["halo_reorder_bytes"], 1), 3)
    print(json.dumps({"summary": out}), flush=True)


if __name__ == "__main__":
    main()
