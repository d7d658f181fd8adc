#!/usr/bin/env python
"""Full-scale pipeline dress rehearsal (VERDICT r2 missing #5).

The real Criteo dataset cannot be downloaded here (no egress), so this
closes the "format-tested only" caveat as far as the environment allows:

  1. synthesize a raw `train.txt` in the exact Criteo Kaggle schema
     (TSV, label + I1..I13 + C14..C39 hex tokens) at >= 10M rows,
     with per-column cardinalities summing to tens of millions;
  2. run the REAL CLI path: --preprocess-raw (routes through the native
     parser, csrc/herald_preproc.cc) -> .npy layout -> mmap
     load_dataset -> --scheduled --autosize, 500 optimizer steps at
     --rows 33762577 (the reference table size) on the available chip;
  3. record the run's report.json next to a stage-timing summary.

    python benchmarks/dress_rehearsal.py [--rows-raw 10000000]
        [--steps 500] [--work-dir /tmp/herald_rehearsal] [--platform ...]

The recorded artifact of the canonical run is committed at
docs/dress_rehearsal_report.json.
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(msg):
    print(f"[rehearsal] {msg}", file=sys.stderr, flush=True)


# Criteo Kaggle schema widths (fixed-width fields: the parsers strip
# nothing, and float("0042") == 42.0 — padding keeps generation pure
# numpy byte-matrix work instead of 400M Python string formats)
N_DENSE, N_SPARSE = 13, 26
DENSE_W, SPARSE_W = 4, 8


def make_columns(rng):
    """Per-column id pools: a few huge columns + a zipf tail, mirroring
    Criteo's skew (sum of uniques lands in the tens of millions)."""
    pools = []
    for j in range(N_SPARSE):
        if j < 4:
            pools.append(8_000_000)     # ~5.7M expected uniques each
        elif j < 10:
            pools.append(400_000)
        else:
            pools.append(20_000)
    return pools


def generate_raw(path, n_rows, seed=0, chunk=1_000_000):
    """Fixed-width TSV: '<label>\\t<4-digit dense>x13\\t<8-hex>x26\\n'."""
    pools = make_columns(np.random.default_rng(seed))
    row_w = 1 + N_DENSE * (1 + DENSE_W) + N_SPARSE * (1 + SPARSE_W) + 1
    digits = np.frombuffer(b"0123456789abcdef", np.uint8)
    t0 = time.perf_counter()
    with open(path, "wb") as f:
        for lo in range(0, n_rows, chunk):
            m = min(chunk, n_rows - lo)
            rng = np.random.default_rng((seed << 20) ^ (lo // chunk))
            buf = np.empty((m, row_w), np.uint8)
            col = 0
            buf[:, col] = digits[rng.integers(0, 2, m)]
            col += 1
            for _ in range(N_DENSE):
                buf[:, col] = ord("\t")
                v = rng.integers(0, 10_000, m)
                for d in range(DENSE_W):
                    buf[:, col + 1 + d] = digits[
                        (v // 10 ** (DENSE_W - 1 - d)) % 10]
                col += 1 + DENSE_W
            for j in range(N_SPARSE):
                buf[:, col] = ord("\t")
                # zipf-ish skew over the pool: squared uniform biases
                # toward low ids, keeping both hot keys and a long tail
                u = rng.random(m)
                v = (u * u * pools[j]).astype(np.int64)
                for d in range(SPARSE_W):
                    buf[:, col + 1 + d] = digits[
                        (v >> (4 * (SPARSE_W - 1 - d))) & 0xF]
                col += 1 + SPARSE_W
            buf[:, col] = ord("\n")
            f.write(buf.tobytes())
            if (lo // chunk) % 2 == 0:
                log(f"generated {lo + m:,}/{n_rows:,} rows")
    dt = time.perf_counter() - t0
    sz = os.path.getsize(path)
    log(f"raw file: {sz/1e9:.2f} GB in {dt:.0f}s")
    return dt, sz


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows-raw", type=int, default=10_000_000)
    ap.add_argument("--steps", type=int, default=0,
                    help="0 = all --nepoch full epochs (default 1, the "
                         "canonical run; the reference's proof is full "
                         "epochs with AUC, run_laia.py:266-289)")
    ap.add_argument("--table-rows", type=int, default=33_762_577)
    ap.add_argument("--work-dir", default="/tmp/herald_rehearsal")
    ap.add_argument("--platform", default=None,
                    help="force a jax platform (default: the real chip)")
    ap.add_argument("--batch-size", type=int, default=256)
    ap.add_argument("--embedding-size", type=int, default=128)
    ap.add_argument("--scan-steps", type=int, default=32)
    ap.add_argument("--nepoch", type=int, default=1,
                    help=">1 separates cold first-pass vs warm "
                         "repeated-epoch steady throughput (the bench's "
                         "5-epoch shape) via steady segments")
    ap.add_argument("--no-plan-cache", action="store_true",
                    help="skip --plan-cache (tape record/replay); the "
                         "planner then runs in-situ on the loop")
    ap.add_argument("--no-device-data", action="store_true",
                    help="skip --device-data (HBM-resident samples)")
    ap.add_argument("--keep-raw", action="store_true")
    ap.add_argument("--benchdist", action="store_true",
                    help="skip raw generation: run the CLI on the "
                         "bench-matched synthetic Zipf stream "
                         "(--samples rows-raw). This is the hot-stream "
                         "leg of VERDICT r3 #1 — same distribution "
                         "bench.py measures, through the production "
                         "entry point; artifact committed at "
                         "docs/dress_rehearsal_report_hotstream.json")
    args = ap.parse_args()

    os.makedirs(args.work_dir, exist_ok=True)
    raw = os.path.join(args.work_dir, "train.txt")
    data_dir = os.path.join(args.work_dir, "processed")
    log_dir = os.path.join(args.work_dir, "logs")
    stages = {}

    from herald_tpu.launch.cli import build_parser, run_training
    cli = ["--model", "wdl_criteo", "--comm", "local", "--scheduled",
           "--autosize", "--bf16-table",
           "--rows", str(args.table_rows),
           "--batch-size", str(args.batch_size),
           "--embedding-size", str(args.embedding_size),
           "--nepoch", str(args.nepoch),
           "--scan-steps", str(args.scan_steps)]
    if args.benchdist:
        log(f"benchdist mode: {args.rows_raw:,} synthetic hot-stream "
            "samples (no raw stage)")
        cli += ["--samples", str(args.rows_raw)]
    else:
        log(f"stage 1: generating {args.rows_raw:,} raw rows ...")
        stages["generate_s"], stages["raw_bytes"] = generate_raw(
            raw, args.rows_raw)
        log("stage 2+3: --preprocess-raw -> mmap load -> scheduled "
            "steps ...")
        cli += ["--preprocess-raw", raw, "--data-path", data_dir]
    if args.steps:
        cli += ["--max-steps", str(args.steps)]
    if not args.no_plan_cache:
        cli += ["--plan-cache", os.path.join(args.work_dir, "tape")]
    if not args.no_device_data:
        cli += ["--device-data"]
    if args.platform:
        cli += ["--platform", args.platform]
    t0 = time.perf_counter()
    report = run_training(build_parser().parse_args(cli))
    stages["cli_total_s"] = round(time.perf_counter() - t0, 1)

    out = {"stages": stages, "cli_args": cli, "report": report}
    os.makedirs(log_dir, exist_ok=True)
    with open(os.path.join(log_dir, "report.json"), "w") as f:
        json.dump(out, f, indent=2, default=float)
    print(json.dumps({
        "rows_raw": args.rows_raw,
        "table_rows": args.table_rows,
        "steps": report["steps"],
        "overflow_rows": report["overflow_rows"],
        "train_loss_last": report["train_loss_last"],
        "val_auc": report["val_auc"],
        "examples_per_sec": round(report["examples_per_sec"], 1),
        "examples_per_sec_steady":
            (round(report["examples_per_sec_steady"], 1)
             if report.get("examples_per_sec_steady") else None),
        "examples_per_sec_steady_segments":
            report.get("examples_per_sec_steady_segments"),
        "generate_s": (round(stages["generate_s"], 1)
                       if "generate_s" in stages else None),
        "cli_total_s": stages["cli_total_s"],
    }), flush=True)
    if not args.benchdist and not args.keep_raw:
        os.remove(raw)


if __name__ == "__main__":
    main()
