from herald_tpu.utils import metrics
