from herald_tpu.data.datasets import (
    DATASETS,
    DatasetSpec,
    dataset_for_model,
    frequency_remap,
    load_dataset,
    synthetic_ctr_data,
)
from herald_tpu.data.loaders import Dataloader, LookaheadDataloader
from herald_tpu.data.prefetch import DevicePrefetcher
from herald_tpu.data.preprocess import (
    preprocess_avazu,
    preprocess_criteo,
    preprocess_criteo_search,
)
