"""Engine with use_pallas_gather must match the XLA-native engine."""

import numpy as np

from herald_tpu import HeraldConfig
from herald_tpu.data import synthetic_ctr_data
from herald_tpu.models import get_model
from herald_tpu.train.engine import Engine

ROWS = 2000
B = 32


def test_pallas_gather_engine_matches_xla():
    model = get_model("wdl_criteo")
    dense, sparse, labels = synthetic_ctr_data(model.spec, B * 4, seed=20,
                                               num_rows=ROWS)
    states = {}
    for flag in (False, True):
        cfg = HeraldConfig(model="wdl_criteo", batch_size=B,
                           embedding_dim=8, comm_mode="local",
                           learning_rate=0.1, use_pallas_gather=flag,
                           optimizer="adagrad")   # exercises dedup path
        eng = Engine(cfg, table_rows=ROWS)
        st = eng.init_state(0)
        for t in range(4):
            sl = slice(t * B, (t + 1) * B)
            st, stats = eng.train_step(st, dense[sl], sparse[sl],
                                       labels[sl])
        states[flag] = (np.asarray(st.table), float(stats["loss"]))
    np.testing.assert_allclose(states[False][1], states[True][1],
                               rtol=1e-6)
    np.testing.assert_allclose(states[False][0], states[True][0],
                               rtol=1e-5, atol=1e-7)
