"""16-device scale smoke: the full scheduled stack on a wider mesh.

The suite's conftest pins 8 virtual devices; this runs a subprocess with
16 to cover the next mesh width (different bucket counts, mask types,
pinned-block divisibility) end-to-end: hybrid baseline + cached engine
with pinned tier + hoisting, overflow-free, loss finite.
"""

import os
import subprocess
import sys
import textwrap

_SCRIPT = textwrap.dedent("""
    import os, sys
    sys.path.insert(0, {repo!r})
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=16"
    import jax
    jax.config.update("jax_platforms", "cpu")
    import numpy as np
    from herald_tpu import HeraldConfig
    from herald_tpu.data import synthetic_ctr_data
    from herald_tpu.models import get_model
    from herald_tpu.train.cached import CachedEngine
    from herald_tpu.train.engine import Engine

    S, B, ROWS, STEPS = 16, 8, 8000, 6
    model = get_model("wdl_criteo")
    dense, sparse, labels = synthetic_ctr_data(model.spec, S * B * STEPS,
                                               seed=2, num_rows=ROWS)
    cfg = HeraldConfig(model="wdl_criteo", batch_size=B, embedding_dim=8,
                       comm_mode="hybrid", learning_rate=0.5,
                       a2a_capacity_factor=8.0)
    eng = Engine(cfg, table_rows=ROWS)
    st = eng.init_state(0)
    st, stats = eng.train_epoch(st, dense, sparse, labels, steps=STEPS)
    assert int(np.asarray(stats["overflow"]).sum()) == 0
    assert np.isfinite(np.asarray(stats["loss"])).all()

    ccfg = HeraldConfig(model="wdl_criteo", batch_size=B, embedding_dim=8,
                        comm_mode="hybrid", learning_rate=0.5,
                        cache_limit_ratio=0.5, pinned_rows=24,  # ->32 (16|P)
                        sched_pull_target=16, sched_hoist_window=4,
                        sched_prefetch_slots=32)
    ceng = CachedEngine(ccfg, table_rows=ROWS)
    assert ceng.pinned_rows % 16 == 0
    pl = ceng.make_planner(sparse, epochs=1, n_threads=2)
    cst = ceng.init_cached_state(0)
    cst, cstats = ceng.train_epoch_cached(cst, pl, dense, sparse, labels,
                                          steps=STEPS)
    assert int(np.asarray(cstats["overflow"]).sum()) == 0
    assert np.isfinite(np.asarray(cstats["loss"])).all()
    cst = ceng.sync_cache(cst, pl)
    pl.close()
    print("SCALE16_OK")
""")


def test_sixteen_device_mesh(tmp_path):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    script = tmp_path / "scale16.py"
    script.write_text(_SCRIPT.format(repo=repo))
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    out = subprocess.run([sys.executable, str(script)],
                         capture_output=True, text=True, env=env,
                         timeout=400)
    assert out.returncode == 0, out.stdout[-2000:] + out.stderr[-2000:]
    assert "SCALE16_OK" in out.stdout
