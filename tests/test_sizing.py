"""Unit tests for the capacity-sizing formulas (sched/sizing.py) — the
numbers every compiled exchange buffer is built from."""

import numpy as np

from herald_tpu.sched.sizing import StepTraffic, TrafficProfile


def _steps():
    return [
        StepTraffic(pull_bucket=40, flush_bucket=10, pulls=100, flushes=20,
                    pull_worker=90, flush_worker=18, uniq_worker=120),
        StepTraffic(pull_bucket=20, flush_bucket=30, pulls=80, flushes=60,
                    pull_worker=70, flush_worker=55, uniq_worker=100),
        StepTraffic(pull_bucket=30, flush_bucket=5, pulls=90, flushes=10,
                    pull_worker=80, flush_worker=9, uniq_worker=110),
    ]


def test_profile_aggregation_and_capacities():
    p = TrafficProfile.from_steps(_steps())
    assert (p.max_pull_bucket, p.max_flush_bucket) == (40, 30)
    assert (p.total_pulls, p.total_flushes) == (270, 90)
    assert p.max_pull_worker == 90 and p.max_flush_worker == 55
    assert p.max_uniq_worker == 120
    np.testing.assert_allclose(p.mean_pull_bucket, 30.0)

    # capacity = ceil(max * headroom) rounded up to the alignment
    assert p.pull_capacity() == 56            # ceil(40*1.25)=50 -> 56
    assert p.flush_capacity() == 40           # ceil(30*1.25)=38 -> 40
    assert p.flush_slots() == 88              # ceil(55*1.5)=83 -> 88
    assert p.unique_slots() == 144            # ceil(120*1.15)=138 -> 144
    assert p.pull_target() == 35              # ceil(30*1.15)

    # hoisted capacity = min(max-based, target-based)
    # target-based: ceil(35*1.25)=44 -> 48; max-based 56 -> 48 wins
    assert p.hoisted_pull_capacity() == 48

    # empty stream degrades to the alignment floor
    empty = TrafficProfile.from_steps([])
    assert empty.pull_capacity() == 8
    assert empty.steps == 0
