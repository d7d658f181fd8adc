from herald_tpu.models.base import (
    ModelDef,
    available_models,
    bce_with_logits,
    get_model,
    register,
)

# model modules self-register on import
from herald_tpu.models import dcn as _dcn  # noqa: F401
from herald_tpu.models import dfm as _dfm  # noqa: F401
from herald_tpu.models import linear as _linear  # noqa: F401
from herald_tpu.models import misc as _misc  # noqa: F401
from herald_tpu.models import wdl as _wdl  # noqa: F401
