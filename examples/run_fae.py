#!/usr/bin/env python
"""FAE-baseline trainer (reference `examples/ctr/run_laia_fae.py` analog):
hot/cold split embeddings — top-frequency IDs in a replicated dense matrix
with psum-reduced grads, cold IDs through the sharded exchange.

    python examples/run_fae.py --model fae_wdl_criteo --comm hybrid \
        --nepoch 1 --batch-size 256 --embedding-size 128 --hot-rate 0.01
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from herald_tpu.launch.cli import build_parser, run_training

if __name__ == "__main__":
    args = build_parser().parse_args()
    args.fae = True
    print(json.dumps(run_training(args), indent=2, default=float))
