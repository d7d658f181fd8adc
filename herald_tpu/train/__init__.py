from herald_tpu.train.engine import Engine, TrainState
