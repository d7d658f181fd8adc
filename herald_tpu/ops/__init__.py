from herald_tpu.ops.embedding import (
    dedup_ids,
    embedding_lookup,
    segment_sum_grads,
)
