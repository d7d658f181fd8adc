#!/usr/bin/env python
"""Herald trainer (reference `examples/ctr/run_laia.py` analog): lookahead
scheduler assigns samples by cache affinity and plans flush/refresh; the
hot-row cache keeps embedding reads local.

    python examples/run_scheduled.py --model wdl_criteo --comm hybrid \
        --nepoch 1 --batch-size 256 --embedding-size 128 \
        --cache-limit-ratio 0.1
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from herald_tpu.launch.cli import build_parser, run_training

if __name__ == "__main__":
    args = build_parser().parse_args()
    args.scheduled = True
    print(json.dumps(run_training(args), indent=2, default=float))
