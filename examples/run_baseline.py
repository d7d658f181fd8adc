#!/usr/bin/env python
"""Baseline trainer (reference `examples/ctr/run_hetu.py` analog): plain
engine — every step pulls embeddings from the owner shards, no cache, no
lookahead scheduling.

    python examples/run_baseline.py --model wdl_criteo --comm hybrid \
        --nepoch 1 --batch-size 256 --embedding-size 128
"""

import sys

from herald_tpu.launch.cli import build_parser, run_training
import json

if __name__ == "__main__":
    args = build_parser().parse_args()
    args.scheduled = False
    print(json.dumps(run_training(args), indent=2, default=float))
