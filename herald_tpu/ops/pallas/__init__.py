from herald_tpu.ops.pallas.kernels import (
    embedding_gather,
    fm_second_order,
    rows_scatter_add,
)
