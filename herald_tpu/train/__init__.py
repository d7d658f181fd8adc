from herald_tpu.train.cached import CachedEngine, CachedTrainState
from herald_tpu.train.engine import Engine, TrainState
