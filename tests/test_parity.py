"""Numerical parity: 8-way hybrid (sharded table + all-to-all + pmean) must
match single-device training on the same global batch.

This is the key correctness invariant the reference establishes between its
PS and local paths (`tests/test_embedding_op.py` vs TF); here the oracle is
our own local mode.
"""

import numpy as np

from herald_tpu import HeraldConfig
from herald_tpu.data import synthetic_ctr_data
from herald_tpu.models import get_model
from herald_tpu.train.engine import Engine

ROWS = 4096
W = 8
B = 16          # per-worker batch in hybrid mode
STEPS = 5


def test_hybrid_matches_local():
    model = get_model("wdl_criteo")
    dense, sparse, labels = synthetic_ctr_data(model.spec, W * B * STEPS,
                                               seed=3, num_rows=ROWS)

    cfg_local = HeraldConfig(model="wdl_criteo", batch_size=W * B,
                             embedding_dim=8, comm_mode="local",
                             learning_rate=0.1)
    cfg_hybrid = HeraldConfig(model="wdl_criteo", batch_size=B,
                              embedding_dim=8, comm_mode="hybrid",
                              learning_rate=0.1,
                              a2a_capacity_factor=8.0)
    e_local = Engine(cfg_local, table_rows=ROWS)
    e_hybrid = Engine(cfg_hybrid, table_rows=ROWS)
    assert e_hybrid.num_shards == W

    s_local = e_local.init_state(0)
    s_hybrid = e_hybrid.init_state(0)
    # random init is keyed by physical position, and the hybrid table's
    # strided layout permutes logical rows — start both engines from the
    # same LOGICAL values by transplanting the local table
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P
    tphys = e_hybrid.exchange.to_physical(np.asarray(s_local.table))
    s_hybrid = s_hybrid._replace(table=jax.device_put(
        tphys, NamedSharding(e_hybrid.mesh, P("dp", None))))

    def hybrid_logical():
        return e_hybrid.exchange.to_logical(np.asarray(s_hybrid.table))

    np.testing.assert_allclose(np.asarray(s_local.table)[:ROWS],
                               hybrid_logical())

    for t in range(STEPS):
        sl = slice(t * W * B, (t + 1) * W * B)
        s_local, st_l = e_local.train_step(
            s_local, dense[sl], sparse[sl], labels[sl])
        s_hybrid, st_h = e_hybrid.train_step(
            s_hybrid, dense[sl], sparse[sl], labels[sl])
        assert int(st_h["overflow"]) == 0
        np.testing.assert_allclose(float(st_l["loss"]),
                                   float(st_h["loss"]), rtol=1e-5)

    np.testing.assert_allclose(np.asarray(s_local.table)[:ROWS],
                               hybrid_logical(),
                               rtol=1e-4, atol=1e-6)
    for k in s_local.dense:
        np.testing.assert_allclose(np.asarray(s_local.dense[k]),
                                   np.asarray(s_hybrid.dense[k]),
                                   rtol=1e-4, atol=1e-6)
