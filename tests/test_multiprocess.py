"""Multi-process (fake multi-host) training test.

TPU equivalent of the reference's localhost multi-process launcher fixture
(`python/hetu/launcher.py` + `tests/pstests/local_s2_w2.yml`): two OS
processes, each with 4 virtual CPU devices, joined via
`jax.distributed.initialize` into one 8-device mesh running the hybrid
train step. Validates that the exchange/train path works across process
boundaries (host boundaries in production), not just within one process.
"""

import os
import socket
import subprocess
import sys
import textwrap

import numpy as np
import pytest

_WORKER = textwrap.dedent("""
    import os, sys
    sys.path.insert(0, {repo!r})
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(coordinator_address={coord!r},
                               num_processes=2,
                               process_id=int(sys.argv[1]),
                               local_device_ids=[0, 1, 2, 3])
    import numpy as np
    from herald_tpu import HeraldConfig
    from herald_tpu.data import synthetic_ctr_data
    from herald_tpu.models import get_model
    from herald_tpu.train.engine import Engine

    assert len(jax.devices()) == 8, jax.devices()
    cfg = HeraldConfig(model="wdl_criteo", batch_size=8, embedding_dim=8,
                       comm_mode="hybrid", learning_rate=0.5)
    model = get_model(cfg.model)
    eng = Engine(cfg, table_rows=1000)
    dense, sparse, labels = synthetic_ctr_data(model.spec, 8 * 8 * 4,
                                               seed=1, num_rows=1000)
    state = eng.init_state(0)
    # each process feeds the full global batch; device_put shards it
    for t in range(4):
        sl = slice(t * 64, (t + 1) * 64)
        state, stats = eng.train_step(state, dense[sl], sparse[sl],
                                      labels[sl])
        loss = float(stats["loss"])
        assert np.isfinite(loss)

    # Multi-host-safe checkpoint: each process writes only its own
    # addressable shards (no host gather — reference saves server-side,
    # ps-lite/include/ps/server/PSFHandle.h:401-439); restore assembles
    # every process's target shards from the per-process block files.
    from herald_tpu.train.checkpoint import (load_checkpoint,
                                             save_checkpoint)
    from jax.experimental import multihost_utils as mhu
    ckpt = os.path.join({ckpt_dir!r}, "ckpt")
    save_checkpoint(state, ckpt)
    mhu.sync_global_devices("ckpt_saved")          # all shard files on disk
    restored = load_checkpoint(ckpt, eng.init_state(123))
    assert int(restored.step) == int(state.step)
    for sh, rh in zip(state.table.addressable_shards,
                      restored.table.addressable_shards):
        assert sh.index == rh.index
        assert (np.asarray(sh.data) == np.asarray(rh.data)).all()
    for k in state.dense:
        assert (np.asarray(restored.dense[k])
                == np.asarray(state.dense[k])).all()
    # training continues from the restored state across both processes
    state2, stats2 = eng.train_step(restored, dense[:64], sparse[:64],
                                    labels[:64])
    assert np.isfinite(float(stats2["loss"]))
    print("CKPT_OK")

    # Herald scheduled path across process boundaries with ONE planner
    # total: process 0 plans, program chunks broadcast to every process
    # (reference analog: per-host TopkScheduler + shm fan-out,
    # laia/src/topk_scheduler.cc:71-88)
    from herald_tpu.train.cached import CachedEngine
    from herald_tpu.sched.service import BroadcastPlanner
    ccfg = HeraldConfig(model="wdl_criteo", batch_size=8, embedding_dim=8,
                        comm_mode="hybrid", learning_rate=0.5,
                        cache_limit_ratio=0.5, pinned_rows=8)
    ceng = CachedEngine(ccfg, table_rows=1000)
    cstate = ceng.init_cached_state(0)
    pid = jax.process_index()
    planner = BroadcastPlanner(
        lambda: ceng.make_planner(sparse, epochs=1, n_threads=1),
        num_samples=len(sparse), nrank=8, batch_size=8,
        unique_cap=ceng.U_cap, flush_cap=ceng.F_cap,
        cache_rows=ceng.cache_rows,
        num_tables=ceng.model.spec.num_sparse)
    # exactly one native planner per job
    assert (planner.planner is not None) == (pid == 0)
    cstate, cstats = ceng.train_epoch_cached(cstate, planner, dense,
                                             sparse, labels, steps=3)
    closses = np.asarray(cstats["loss"])
    assert len(closses) == 3 and np.isfinite(closses).all()
    # drain the stream, then the broadcast final-sync must work on every
    # process (followers receive the dirty dump)
    while True:
        cstate, cstats = ceng.train_epoch_cached(cstate, planner, dense,
                                                 sparse, labels, steps=4)
        if cstats is None:
            break
    cstate = ceng.sync_cache(cstate, planner)
    perf = planner.perf()      # broadcast: identical on every process
    print("SCHED_PERF", perf["miss_pull"], perf["update_push"])
    print("SCHED_LOSS", " ".join(f"{{l:.6f}}" for l in closses))
    planner.close()

    # multi-host RESUME path: leader fast-forwards, the skip count and
    # the post-skip program chunks broadcast identically
    bp2 = BroadcastPlanner(
        lambda: ceng.make_planner(sparse, epochs=1, n_threads=1),
        num_samples=len(sparse), nrank=8, batch_size=8,
        unique_cap=ceng.U_cap, flush_cap=ceng.F_cap,
        cache_rows=ceng.cache_rows,
        num_tables=ceng.model.spec.num_sparse)
    skipped = bp2.fast_forward(2)
    assert skipped == 2, skipped
    K2, assign2, *_rest = bp2.pop_chunk(2)
    assert K2 == 2
    print("FFWD_SUM", int(assign2[:K2].sum()))
    bp2.close()

    # dense-sync relaxation across process boundaries: the periodic model
    # average is a psum inside lax.cond whose predicate must stay uniform
    # over BOTH processes' devices, and the subgroup grad all-reduce
    # lowers to replica_groups spanning the distributed mesh
    dcfg = HeraldConfig(model="wdl_criteo", batch_size=8, embedding_dim=8,
                        comm_mode="hybrid", learning_rate=0.5,
                        dense_sync_every=2, dense_sync_group=2)
    deng = Engine(dcfg, table_rows=1000)
    dstate = deng.init_state(0)
    dstate, dstats = deng.train_epoch(dstate, dense, sparse, labels,
                                      steps=4)
    dlosses = np.asarray(dstats["loss"])
    assert len(dlosses) == 4 and np.isfinite(dlosses).all()
    print("DSYNC_LOSS", " ".join(f"{{l:.6f}}" for l in dlosses))
    print("FINAL_LOSS", loss)
""")


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_hybrid_training(tmp_path):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    coord = f"127.0.0.1:{_free_port()}"
    script = tmp_path / "worker.py"
    script.write_text(_WORKER.format(repo=repo, coord=coord,
                                     ckpt_dir=str(tmp_path)))
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    procs = [subprocess.Popen([sys.executable, str(script), str(pid)],
                              stdout=subprocess.PIPE,
                              stderr=subprocess.STDOUT, text=True, env=env)
             for pid in range(2)]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=200)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("multi-process run timed out")
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {pid} failed:\n{out[-3000:]}"
    losses = [line.split()[1] for out in outs for line in out.splitlines()
              if line.startswith("FINAL_LOSS")]
    assert len(losses) == 2
    # both processes computed the same replicated loss
    assert abs(float(losses[0]) - float(losses[1])) < 1e-6
    # broadcast-planner runs agree across processes: same scheduled
    # losses, same (broadcast) planner counters
    for tag in ("SCHED_LOSS", "SCHED_PERF", "FFWD_SUM", "DSYNC_LOSS"):
        lines = [line for out in outs for line in out.splitlines()
                 if line.startswith(tag)]
        assert len(lines) == 2 and lines[0] == lines[1], lines
