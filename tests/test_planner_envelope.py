"""Planner operating-envelope warning (VERDICT r3 #7).

docs/OPERATIONS.md documents the measured 1-core planning cost curve
(7.5/13/47/134 ms per batch at 8/16/32/64 ranks) and the sustainability
rule ms_per_batch / min(cores, nrank) <= device_step_ms. The planner
warns at construction when an ONLINE configuration is clearly outside
that envelope on this host, pointing to the plan tape (--plan-cache).
"""

import warnings

import numpy as np
import pytest

from herald_tpu.sched.planner import CachePlanner


def _mk(nrank):
    ids = np.random.default_rng(0).integers(
        0, 50_000, (nrank * 16 * 4, 4)).astype(np.int64)
    return CachePlanner(ids, nrank=nrank, batch_size=16, cache_rows=200,
                        num_shards=nrank,
                        rows_per_shard=(50_000 + nrank - 1) // nrank,
                        epochs=1, n_threads=1)


def test_64_rank_online_warns_on_few_core_host():
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        pl = _mk(64)
        pl.close()
    msgs = [str(x.message) for x in w if "envelope" in str(x.message)]
    assert msgs and "--plan-cache" in msgs[0], msgs


def test_8_rank_online_stays_quiet():
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        pl = _mk(8)
        pl.close()
    assert not [x for x in w if "envelope" in str(x.message)]
