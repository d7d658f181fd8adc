"""Model zoo: every registered tower must run fwd+bwd on a single-chip step
and shrink the loss (reference analog: examples/ctr/tests/local_*.sh)."""

import numpy as np
import pytest

from herald_tpu import HeraldConfig
from herald_tpu.data import Dataloader, synthetic_ctr_data
from herald_tpu.models import available_models, get_model
from herald_tpu.train.engine import Engine

ROWS = 2000
BATCH = 32


@pytest.mark.parametrize("name", available_models())
def test_model_trains_one_epoch(name):
    model = get_model(name)
    cfg = HeraldConfig(model=name, batch_size=BATCH, embedding_dim=8,
                       comm_mode="local", learning_rate=model.default_lr)
    eng = Engine(cfg, table_rows=ROWS)
    dense, sparse, labels = synthetic_ctr_data(model.spec, 512, seed=2,
                                               num_rows=ROWS)
    dl = Dataloader([dense, sparse, labels], BATCH, nrank=1)
    state = eng.init_state(0)
    losses = []
    for d, s, y in dl:
        state, stats = eng.train_step(state, d, s, y)
        losses.append(float(stats["loss"]))
    assert np.isfinite(losses).all(), name
    preds = eng.predict(state, dense[:BATCH], sparse[:BATCH])
    assert np.asarray(preds).shape == (BATCH,)
    assert (np.asarray(preds) >= 0).all() and (np.asarray(preds) <= 1).all()


def test_fae_variants_registered():
    """The 4 reference fae_* builders exist and are tagged for FaeEngine
    (reference: examples/ctr/models/fae_*.py)."""
    from herald_tpu.models import available_models, get_model
    names = available_models()
    assert len(names) >= 21
    for name in ("fae_wdl_criteo", "fae_dfm_avazu",
                 "fae_dcn_criteosearch", "fae_ncf_movie"):
        m = get_model(name)
        assert m.train_engine == "fae"
        base = get_model(name[4:])
        assert m.spec is base.spec and m.apply is base.apply
