from herald_tpu.ops.pallas.kernels import (
    embedding_gather,
    fm_second_order,
    hot_onehot_gather,
    hot_onehot_push,
    rows_scatter_add,
)
