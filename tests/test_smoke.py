"""End-to-end smoke: single-device and 8-way hybrid training must run and
reduce the loss on synthetic Criteo-shaped data (reference analog:
`examples/ctr/tests/local_*.sh` / `hybrid_*.sh` integration scripts)."""

import jax
import numpy as np
import pytest

from herald_tpu import HeraldConfig
from herald_tpu.data import Dataloader, synthetic_ctr_data, DATASETS
from herald_tpu.models import get_model
from herald_tpu.train.engine import Engine

ROWS = 5000   # scaled-down table for tests
N = 2048
BATCH = 64


def _make_data(spec, n=N):
    return synthetic_ctr_data(spec, n, seed=1, num_rows=ROWS)


@pytest.mark.parametrize("comm_mode,lr", [("local", 0.5), ("hybrid", 4.0)])
def test_wdl_train_learns(comm_mode, lr):
    # hybrid trains the same data in 8x larger global batches -> 8x fewer
    # steps, so scale lr linearly for equal progress
    cfg = HeraldConfig(model="wdl_criteo", batch_size=BATCH,
                       embedding_dim=16, comm_mode=comm_mode,
                       learning_rate=lr)
    model = get_model(cfg.model)
    eng = Engine(cfg, table_rows=ROWS)
    dense, sparse, labels = _make_data(model.spec)
    nrank = eng.num_shards
    dl = Dataloader([dense, sparse, labels], BATCH, nrank=nrank)
    state = eng.init_state(0)

    epoch_losses = []
    for _ in range(4):
        losses = []
        for d, s, y in dl:
            state, stats = eng.train_step(state, d, s, y)
            losses.append(float(stats["loss"]))
            assert int(stats["overflow"]) == 0
        epoch_losses.append(np.mean(losses))
    assert np.isfinite(epoch_losses).all()
    assert epoch_losses[-1] < epoch_losses[0], epoch_losses
    res = eng.evaluate(state, dense, sparse, labels)
    assert res["auc"] > 0.6, res


def test_graphboard_emits_graphs():
    """Reference python/graphboard analog: lower the train step and emit
    its computation graph in three formats."""
    from herald_tpu.utils import graphboard
    cfg = HeraldConfig(model="wdl_criteo", batch_size=8, embedding_dim=8,
                       comm_mode="local")
    eng = Engine(cfg, table_rows=500)
    dot = graphboard.step_graph(eng, fmt="dot")
    assert dot.startswith("digraph") or "digraph" in dot[:200]
    shlo = graphboard.step_graph(eng, fmt="stablehlo")
    assert "func.func" in shlo
    opt = graphboard.step_graph(eng, fmt="hlo_opt")
    assert "HloModule" in opt or "ENTRY" in opt
