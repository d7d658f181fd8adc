"""Elastic supervisor: restart-on-failure around the training CLI.

The reference's failure story is transport-level: Van heartbeats detect a
dead node and the scheduler re-admits a single recovered node into the
ring (`ps-lite/src/van.cc:48-116`), with message retransmit as the safety
net (`resender.h:15-50`). On TPU an SPMD program is all-or-nothing — a
lost chip kills the step everywhere — so the native recovery unit is the
JOB: periodic checkpoints (--ckpt-every) + deterministic resume
(--resume, planner fast-forward) + a supervisor that relaunches the
training process until it finishes.

    python -m herald_tpu.launch.supervise [supervisor flags] -- \
        --model wdl_criteo --scheduled --nepoch 1 ...

The child is the ordinary CLI; the supervisor injects --ckpt/--ckpt-every
on launch and --resume on every restart (only when a checkpoint manifest
exists). Exit code 0 stops; nonzero exits restart with exponential
backoff up to --max-restarts.
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys
import time


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="herald_tpu.launch.supervise",
        description="restart-on-failure supervisor for the training CLI")
    p.add_argument("--ckpt-dir", required=True,
                   help="checkpoint dir (injected as --ckpt; --resume "
                        "added on restarts when a manifest exists)")
    p.add_argument("--ckpt-every", type=int, default=50,
                   help="injected into the child (steps between "
                        "checkpoints; the replay window after a crash)")
    p.add_argument("--max-restarts", type=int, default=3)
    p.add_argument("--backoff", type=float, default=2.0,
                   help="base seconds; doubles per consecutive failure")
    p.add_argument("child_args", nargs=argparse.REMAINDER,
                   help="-- followed by herald_tpu.launch flags")
    return p


def _has_checkpoint(path: str) -> bool:
    # versioned layout: LATEST points at the newest complete save;
    # legacy flat layout keeps manifest.json at the top level
    return (os.path.exists(os.path.join(path, "LATEST"))
            or os.path.exists(os.path.join(path, "manifest.json")))


def supervise(argv=None) -> int:
    args = build_parser().parse_args(argv)
    child = [a for a in args.child_args if a != "--"]
    restarts = 0
    while True:
        cmd = [sys.executable, "-m", "herald_tpu.launch", *child,
               "--ckpt", args.ckpt_dir,
               "--ckpt-every", str(args.ckpt_every)]
        if _has_checkpoint(args.ckpt_dir):
            cmd += ["--resume", args.ckpt_dir]
        print(f"[supervise] launch (attempt {restarts + 1}): "
              + " ".join(cmd[2:]), file=sys.stderr, flush=True)
        rc = subprocess.call(cmd)
        if rc == 0:
            return 0
        restarts += 1
        if restarts > args.max_restarts:
            print(f"[supervise] giving up after {args.max_restarts} "
                  f"restarts (last rc={rc})", file=sys.stderr, flush=True)
            return rc
        delay = args.backoff * (2 ** (restarts - 1))
        print(f"[supervise] child died rc={rc}; restarting from "
              f"checkpoint in {delay:.1f}s", file=sys.stderr, flush=True)
        time.sleep(delay)


if __name__ == "__main__":
    sys.exit(supervise())
