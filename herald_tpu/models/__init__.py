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

# ----------------------------------------------------------------------
# FAE variants (reference: examples/ctr/models/fae_{wdl_criteo,
# deepfm_avazu, dcn_criteosearch, ncf_movie}.py + run_laia_fae.py).
# The reference rebuilds each tower with a hot-embedding dense matrix
# baked into the graph; here the hot/cold split is an ENGINE concern
# (herald_tpu.train.fae.FaeEngine works with any tower), so the fae_*
# names are the same towers tagged train_engine="fae" — the launcher
# picks FaeEngine and profiles hot IDs at startup (build_hot_lut ==
# FAE's offline hot-feature profiling). Registered here because they
# alias models from several modules.
# ----------------------------------------------------------------------
import dataclasses as _dc

for _base, _fae in [("wdl_criteo", "fae_wdl_criteo"),
                    ("dfm_avazu", "fae_dfm_avazu"),
                    ("dcn_criteosearch", "fae_dcn_criteosearch"),
                    ("ncf_movie", "fae_ncf_movie")]:
    register(_dc.replace(get_model(_base), name=_fae, train_engine="fae"))
del _base, _fae, _dc
