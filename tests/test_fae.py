"""FAE (hot/cold split) baseline tests."""

import numpy as np
import pytest

from herald_tpu import HeraldConfig
from herald_tpu.data import synthetic_ctr_data
from herald_tpu.models import get_model
from herald_tpu.train.fae import FaeEngine, build_hot_lut

ROWS = 2000
B = 32


def test_hot_lut_picks_most_frequent():
    ids = np.array([[1, 1], [1, 2], [1, 2], [3, 4]])
    lut, hot = build_hot_lut(ids, num_rows=10, num_hot=2)
    assert set(hot.tolist()) == {1, 2}
    assert lut[1] >= 0 and lut[2] >= 0
    assert lut[3] == -1 and lut[0] == -1


@pytest.mark.parametrize("comm_mode,b,lr", [("local", B, 0.5),
                                            ("hybrid", 8, 2.0)])
def test_fae_trains(comm_mode, b, lr):
    cfg = HeraldConfig(model="wdl_criteo", batch_size=b, embedding_dim=8,
                       comm_mode=comm_mode, learning_rate=lr)
    model = get_model(cfg.model)
    eng = FaeEngine(cfg, table_rows=ROWS, hot_rate=0.05)
    dense, sparse, labels = synthetic_ctr_data(model.spec, 2048, seed=12,
                                               num_rows=ROWS)
    lut, _ = build_hot_lut(sparse, ROWS, num_hot=eng.num_hot)
    nrank = max(eng.num_shards, 1)
    gb = b * nrank
    state = eng.init_fae_state(0)
    losses = []
    for ep in range(4):
        for t in range(len(sparse) // gb):
            sl = slice(t * gb, (t + 1) * gb)
            state, stats = eng.train_step_fae(
                state, lut, dense[sl], sparse[sl], labels[sl])
            losses.append(float(stats["loss"]))
    assert np.isfinite(losses).all()
    res = eng.evaluate_fae(state, lut, dense, sparse, labels)
    assert res["auc"] > 0.6, res


def test_fae_hot_rows_actually_update():
    cfg = HeraldConfig(model="wdl_criteo", batch_size=B, embedding_dim=8,
                       comm_mode="local", learning_rate=0.5)
    model = get_model(cfg.model)
    eng = FaeEngine(cfg, table_rows=ROWS, num_hot=50)
    dense, sparse, labels = synthetic_ctr_data(model.spec, B * 2, seed=13,
                                               num_rows=ROWS)
    lut, hot_ids = build_hot_lut(sparse, ROWS, num_hot=50)
    state = eng.init_fae_state(0)
    hot_before = np.asarray(state.hot_table).copy()
    state, _ = eng.train_step_fae(state, lut, dense[:B], sparse[:B],
                                  labels[:B])
    hot_after = np.asarray(state.hot_table)
    assert np.abs(hot_after - hot_before).max() > 0
