"""herald_tpu — a TPU-native embedding-model training engine.

Re-creates the capabilities of HKUST-SING/herald (Hetu + the Laia lookahead
embedding scheduler, NSDI'24) with a TPU-first architecture:

- Embedding tables are **row-sharded jax.Arrays** over a `jax.sharding.Mesh`
  (replacing the parameter-server tier, `ps-lite/` in the reference).
- Push/pull RPCs become **all-to-all ID/vector exchange** inside `shard_map`
  (replacing `ps-lite/include/ps/worker/PSAgent.h` routing).
- The worker-side embedding cache (`src/hetu_cache/` in the reference) becomes
  a **device-resident hot-row cache** with host-planned refresh.
- The Laia/Topk lookahead scheduler (`laia/` in the reference) is an async
  host-side C++ pipeline that simulates per-worker caches and emits sample
  assignments + communication plans one batch ahead.
- Dense towers (WDL/DeepFM/DCN/NCF) run data-parallel with XLA collectives
  (replacing NCCL allreduce, `src/communication/` in the reference).
"""

from herald_tpu import config as config
from herald_tpu import data as data
from herald_tpu import models as models
from herald_tpu import ops as ops
from herald_tpu import optim as optim
from herald_tpu import parallel as parallel
from herald_tpu import utils as utils
from herald_tpu.config import HeraldConfig
from herald_tpu.train.engine import Engine
from herald_tpu.train.cached import CachedEngine, CachedTrainState
from herald_tpu.train.engine import TrainState
from herald_tpu.train.checkpoint import load_checkpoint, save_checkpoint

__version__ = "0.2.0"
