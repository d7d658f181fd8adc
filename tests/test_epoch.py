"""Scanned-executor tests: train_epoch (lax.scan over K steps in one jit
call) must be step-for-step identical to K train_step calls."""

import numpy as np
import pytest

from herald_tpu import HeraldConfig
from herald_tpu.data import synthetic_ctr_data
from herald_tpu.models import get_model
from herald_tpu.train.engine import Engine

ROWS = 2000
K = 6


@pytest.mark.parametrize("comm_mode,b,opt", [
    ("local", 64, "sgd"),       # fast path (no dedup)
    ("local", 64, "adagrad"),   # dedup path
    ("hybrid", 8, "sgd"),
])
def test_epoch_matches_steps(comm_mode, b, opt):
    cfg = HeraldConfig(model="wdl_criteo", batch_size=b, embedding_dim=8,
                       comm_mode=comm_mode, learning_rate=0.1,
                       optimizer=opt)
    model = get_model(cfg.model)
    gb = b * (8 if comm_mode == "hybrid" else 1)
    dense, sparse, labels = synthetic_ctr_data(model.spec, gb * K, seed=4,
                                               num_rows=ROWS)

    e1 = Engine(cfg, table_rows=ROWS)
    s1 = e1.init_state(0)
    step_losses = []
    for t in range(K):
        sl = slice(t * gb, (t + 1) * gb)
        s1, st = e1.train_step(s1, dense[sl], sparse[sl], labels[sl])
        step_losses.append(float(st["loss"]))

    e2 = Engine(cfg, table_rows=ROWS)
    s2 = e2.init_state(0)
    s2, stats = e2.train_epoch(s2, dense, sparse, labels)
    np.testing.assert_allclose(np.asarray(stats["loss"]), step_losses,
                               rtol=1e-5)
    np.testing.assert_allclose(np.asarray(s1.table), np.asarray(s2.table),
                               rtol=1e-5, atol=1e-7)


def test_dataloader_tail_padding_cycles():
    """drop_last=False: every emitted batch is full-size even when the
    remainder is smaller than half the batch (regression: np.resize
    cycling, not single-wrap concat)."""
    from herald_tpu.data import Dataloader
    arrays = [np.arange(1000).reshape(-1, 1)]
    dl = Dataloader(arrays, batch_size=300, nrank=1, drop_last=False)
    assert dl.batch_num == 4
    for _ in range(dl.batch_num):
        (batch,) = dl.next_batch()
        assert batch.shape == (1, 300, 1)


def test_evaluate_scores_every_sample():
    """evaluate pads the tail batch instead of dropping it (and handles
    n < batch)."""
    from herald_tpu import HeraldConfig
    from herald_tpu.models import get_model
    from herald_tpu.train.engine import Engine
    from herald_tpu.data import synthetic_ctr_data
    cfg = HeraldConfig(model="wdl_criteo", batch_size=32,
                       embedding_dim=8, comm_mode="local")
    model = get_model(cfg.model)
    eng = Engine(cfg, table_rows=500)
    state = eng.init_state(0)
    for n in (7, 40, 95):
        d, s, y = synthetic_ctr_data(model.spec, n, seed=1, num_rows=500)
        res = eng.evaluate(state, d, s, y)
        assert np.isfinite(res["acc"]), (n, res)
        assert 0.0 <= res["auc"] <= 1.0
