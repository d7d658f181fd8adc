#!/usr/bin/env python
"""Baseline trainer (reference `examples/ctr/run_hetu.py` analog): plain
engine — every step pulls embeddings from the owner shards, no cache, no
lookahead scheduling.

    python examples/run_baseline.py --model wdl_criteo --comm hybrid \
        --nepoch 1 --batch-size 256 --embedding-size 128
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from herald_tpu.launch.cli import build_parser, run_training

if __name__ == "__main__":
    args = build_parser().parse_args()
    args.scheduled = False
    print(json.dumps(run_training(args), indent=2, default=float))
