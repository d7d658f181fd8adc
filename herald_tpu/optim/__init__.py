from herald_tpu.optim.optimizers import Optimizer, get_optimizer, OPTIMIZERS
