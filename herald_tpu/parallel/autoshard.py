"""Bounded auto-parallel layout search — the TPU-native FlexFlow analog.

Reference: `python/hetu/distribute.py:379-1460` — FlexFlow runs MCMC over
per-op split states, scoring candidates with a profiled cost model
(per-op execution timing + simulated transfers) to pick a parallel layout.

The TPU rebuild inverts each design decision:

- **Search space**: not arbitrary per-op states but the layouts this
  framework actually supports — the (dp, mp) mesh factorizations of the
  device count, with the Megatron TP tower where the model carries a
  `tp_plan`. The space is tiny, so **exhaustive enumeration replaces
  MCMC** (determinism for free).
- **Cost model**: not profiled kernels but the **compiled program
  itself** — every candidate is jit-compiled and its exact per-step
  collective buffer bytes are read off the optimized HLO
  (`utils/hlo_stats`), with per-device FLOPs from XLA's own
  `cost_analysis()`. No measurement noise, no warm-up runs, and the cost
  of a layout is the cost of the program XLA will actually run.
- **Score**: step time estimate = max(comm, compute) under a roofline:
  comm = wire bytes / ICI bandwidth, compute = flops / MXU throughput
  (collectives overlap compute on TPU, hence max not sum).

`search_layout` returns the winning HeraldConfig plus the full scored
table, so the choice is auditable (the reference logs its MCMC trace for
the same reason).
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Tuple

import jax
import numpy as np

from herald_tpu.config import HeraldConfig
from herald_tpu.utils import hlo_stats


@dataclasses.dataclass
class LayoutScore:
    """One candidate layout and its roofline decomposition."""
    mp_shards: int
    valid: bool                 # False: model/tower cannot host this mp
    reason: str = ""
    a2a_bytes: int = 0          # embedding exchange (per device per step)
    other_coll_bytes: int = 0   # psum/all-gather etc. (dense grads, TP)
    flops: float = 0.0          # per-device per-step
    comm_us: float = 0.0
    compute_us: float = 0.0
    step_us: float = 0.0        # max(comm, compute)


def _wire_bytes(coll: dict, num_shards: int, dp: int,
                mp: int) -> Tuple[int, int]:
    """Split collective buffer bytes into (a2a, other), scaled to the
    bytes that actually cross links: a group-g collective moves (g-1)/g
    of its buffer. The embedding all-to-all runs over the FULL flat mesh
    (g = S); the tower's all-gather/reduce-scatter run over the mp
    subgroup and the dense-grad all-reduce over the dp subgroup — an
    approximation by collective KIND (exact for the programs this
    engine emits; replica-group parsing would generalize it)."""
    def f(g):
        return (g - 1) / g if g > 1 else 0.0

    a2a = int(coll.get("all-to-all", 0) * f(num_shards))
    gather = sum(coll.get(k, 0) for k in ("all-gather", "reduce-scatter",
                                          "collective-permute"))
    allred = coll.get("all-reduce", 0)
    other = int(gather * f(mp if mp > 1 else num_shards)
                + allred * f(dp if mp > 1 else num_shards))
    return a2a, other


def _flops_of(compiled) -> float:
    ca = compiled.cost_analysis()
    if isinstance(ca, (list, tuple)):
        ca = ca[0] if ca else {}
    return float(ca.get("flops", 0.0)) if ca else 0.0


def search_layout(model: str, n_devices: Optional[int] = None,
                  batch_size: int = 256, embedding_dim: int = 128,
                  table_rows: Optional[int] = None,
                  ici_gbps: float = 90.0, mxu_tflops: float = 197.0,
                  devices=None,
                  ) -> Tuple[HeraldConfig, List[LayoutScore]]:
    """Enumerate (dp, mp) layouts for `model` on `n_devices`, compile each
    train step, score with the HLO roofline, and return
    (best HeraldConfig, all scores). `ici_gbps`/`mxu_tflops` default to
    v5e-class numbers; pass the target part's values to retarget.
    """
    from herald_tpu.train.engine import Engine

    devices = list(devices if devices is not None else jax.devices())
    n = n_devices or len(devices)
    devices = devices[:n]
    assert len(devices) == n, f"need {n} devices, have {len(devices)}"

    candidates = [m for m in range(1, n + 1) if n % m == 0]
    scores: List[LayoutScore] = []
    for mp in candidates:
        cfg = HeraldConfig(model=model, batch_size=batch_size,
                           embedding_dim=embedding_dim, comm_mode="hybrid",
                           mp_shards=mp)
        try:
            eng = Engine(cfg, mesh=cfg.make_mesh(devices),
                         table_rows=table_rows)
        except ValueError as e:    # no TP tower / width not divisible
            scores.append(LayoutScore(mp_shards=mp, valid=False,
                                      reason=str(e).split(";")[0]))
            continue
        state = eng.init_state(0)
        args = eng.example_step_args()
        lowered = eng._train_step.lower(state, *args)
        compiled = lowered.compile()
        coll = hlo_stats.parse_collective_bytes(compiled.as_text())
        a2a, other = _wire_bytes(coll, eng.num_shards, eng.dp_shards, mp)
        flops = _flops_of(compiled)
        comm_us = (a2a + other) / (ici_gbps * 1e3)     # bytes/GBps -> us
        compute_us = flops / (mxu_tflops * 1e6)
        scores.append(LayoutScore(
            mp_shards=mp, valid=True, a2a_bytes=a2a,
            other_coll_bytes=other, flops=flops, comm_us=comm_us,
            compute_us=compute_us, step_us=max(comm_us, compute_us)))
        # free device state before the next candidate compiles
        jax.tree.map(lambda x: x.delete()
                     if isinstance(x, jax.Array) else None, state)

    valid = [s for s in scores if s.valid]
    assert valid, f"no valid layout for {model} on {n} devices"
    best = min(valid, key=lambda s: (s.step_us, s.mp_shards))
    best_cfg = HeraldConfig(model=model, batch_size=batch_size,
                            embedding_dim=embedding_dim,
                            comm_mode="hybrid", mp_shards=best.mp_shards)
    return best_cfg, scores


def main(argv=None):
    """`python -m herald_tpu.parallel.autoshard MODEL [N]` — print the
    scored layout table (the audit-trail analog of FlexFlow's search log)
    and the chosen config."""
    import argparse
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("model")
    p.add_argument("n_devices", nargs="?", type=int, default=None)
    p.add_argument("--batch-size", type=int, default=256)
    p.add_argument("--embedding-size", type=int, default=128)
    p.add_argument("--rows", type=int, default=None)
    p.add_argument("--ici-gbps", type=float, default=90.0)
    p.add_argument("--mxu-tflops", type=float, default=197.0)
    p.add_argument("--platform", default=None,
                   help="force a jax platform (e.g. 'cpu' with "
                   "XLA_FLAGS=--xla_force_host_platform_device_count=N "
                   "to search layouts without hardware)")
    args = p.parse_args(argv)
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    cfg, scores = search_layout(
        args.model, args.n_devices, batch_size=args.batch_size,
        embedding_dim=args.embedding_size, table_rows=args.rows,
        ici_gbps=args.ici_gbps, mxu_tflops=args.mxu_tflops)
    print(f"{'mp':>4} {'a2a B':>12} {'other B':>12} {'comm us':>9} "
          f"{'compute us':>11} {'step us':>9}")
    for s in scores:
        if not s.valid:
            print(f"{s.mp_shards:>4} invalid: {s.reason}")
            continue
        print(f"{s.mp_shards:>4} {s.a2a_bytes:>12} {s.other_coll_bytes:>12}"
              f" {s.comm_us:>9.2f} {s.compute_us:>11.2f} {s.step_us:>9.2f}")
    print(f"chosen: mp_shards={cfg.mp_shards}")


if __name__ == "__main__":
    main()
