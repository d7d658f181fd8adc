"""Auto-parallel layout search (parallel/autoshard.py) — the bounded
FlexFlow analog: exhaustive (dp, mp) enumeration scored on compiled-HLO
collective bytes + XLA cost_analysis flops.

Reference: `python/hetu/distribute.py:379-1460` (MCMC over per-op split
states with a profiled cost model); validated there by running the chosen
strategy, as here.
"""

import numpy as np

from herald_tpu.parallel.autoshard import search_layout


def test_search_audit_table_structure():
    """The audit table must carry every (dp, mp) factorization with a
    consistent roofline: the embedding all-to-all is mp-independent
    (flat table sharding), costs are positive, and the returned config
    is the argmin of step_us. (Which mp wins is a cost-model OUTCOME —
    at this toy scale the search finds that TP shrinks the dense-grad
    all-reduce group enough to beat pure DP, exactly the kind of
    non-obvious choice the reference builds FlexFlow to make.)"""
    cfg, scores = search_layout("wdl_criteo", 8, batch_size=32,
                                embedding_dim=16, table_rows=4096)
    valid = [s for s in scores if s.valid]
    assert {s.mp_shards for s in valid} == {1, 2, 4, 8}
    # invariant: the embedding exchange is mp-independent (flat sharding)
    assert len({s.a2a_bytes for s in valid}) == 1
    assert all(s.step_us > 0 and s.comm_us > 0 and s.flops > 0
               for s in valid)
    best = min(valid, key=lambda s: (s.step_us, s.mp_shards))
    assert cfg.mp_shards == best.mp_shards


def test_search_skips_unsupported_towers():
    """Models without a TP tower still search (mp=1 only), with the
    rejected candidates carried in the audit table."""
    cfg, scores = search_layout("dc_criteo", 8, batch_size=32,
                                embedding_dim=16, table_rows=4096)
    assert cfg.mp_shards == 1
    invalid = [s for s in scores if not s.valid]
    assert invalid and all(s.reason for s in invalid)
    assert [s.mp_shards for s in scores if s.valid] == [1]


def test_chosen_layout_runs():
    """The winning config must actually train (FlexFlow's own acceptance
    check: execute the chosen strategy)."""
    from herald_tpu.data import synthetic_ctr_data
    from herald_tpu.models import get_model
    from herald_tpu.train.engine import Engine

    cfg, _ = search_layout("dfm_criteo", 8, batch_size=8,
                           embedding_dim=8, table_rows=2048)
    eng = Engine(cfg, table_rows=2048)
    model = get_model(cfg.model)
    dense, sparse, labels = synthetic_ctr_data(
        model.spec, 8 * cfg.batch_size, seed=1, num_rows=2048)
    state = eng.init_state(0)
    state, stats = eng.train_step(state, dense, sparse, labels)
    assert np.isfinite(float(stats["loss"]))
