"""Packed program wire + CLI prestage pipeline (round-4 CLI-gap work).

The production loop's limiter on tunnel transports is per-chunk staging:
each individual device_put pays a fixed dispatch latency comparable to a
~2 MB payload, so shipping a chunk's 7-9 program arrays separately cost
~8x one batched transfer (docs/dress_rehearsal_report.json 2026-08-19:
p50 device time 18.6 ms/chunk vs ~127 ms/chunk host staging). Two fixes,
both exactness-preserving by construction and pinned here bit-for-bit:

  * packed wire (cfg.sched_packed_wire, single-shard): one uint8 buffer
    per chunk, unpacked on device with static slices + bitcasts inside
    the SAME scanned epoch body (train/cached.py _pack_wire/_unpack_wire);
  * CLI --prestage: a pop thread + staging pool keeps N chunks staged
    ahead of the loop, overlapping transfer with device execution
    (launch/cli.py _Prestager); serve-view residency mirrors advance at
    DISPATCH time, so mid-stream checkpoints stay serve-exact.

Reference bar: the scheduler runs ahead of training on a background
thread (laia/src/topk_scheduler.cc:259-360); the staging pipeline extends
that overlap to transfer latency, which the reference's PCIe-local GPUs
never paid.
"""

import numpy as np
import pytest

import jax

from herald_tpu import HeraldConfig
from herald_tpu.data import synthetic_ctr_data
from herald_tpu.launch.cli import build_parser, run_training
from herald_tpu.models import get_model
from herald_tpu.train.cached import (CachedEngine, PackedChunk, _pack_wire,
                                     _unpack_wire)

B, STEPS = 16, 24


def _train(packed: bool, device_data: bool, ratio: float, epochs: int,
           rows: int = 900):
    cfg = HeraldConfig(model="wdl_criteo", batch_size=B, embedding_dim=8,
                       comm_mode="local", learning_rate=0.5,
                       cache_limit_ratio=ratio, sched_packed_wire=packed)
    model = get_model(cfg.model)
    dense, sparse, labels = synthetic_ctr_data(model.spec, B * STEPS,
                                               seed=9, num_rows=rows)
    eng = CachedEngine(cfg, table_rows=rows)
    planner = eng.make_planner(sparse, epochs=epochs, n_threads=1)
    st = eng.init_cached_state(0)
    dd = (eng.stage_dataset(dense, sparse.astype(np.int32), labels)
          if device_data else None)
    losses = []
    while True:
        st, stats = eng.train_epoch_cached(st, planner, dense, sparse,
                                           labels, steps=6, device_data=dd)
        if stats is None:
            break
        losses.append(np.asarray(stats["loss"]))
    st = eng.sync_cache(st, planner)
    planner.close()
    return (np.asarray(st.table), np.concatenate(losses),
            eng.noflush_chunks, eng.nopull_chunks)


def test_roundtrip_unpack_inverts_pack():
    rng = np.random.default_rng(0)
    # the production wire carries f32/i32/i16/bool only (idx is cast to
    # int32 before packing; int64 would need jax_enable_x64)
    host = (rng.standard_normal((3, 4)).astype(np.float32),
            rng.integers(-5, 5, (2, 7)).astype(np.int32),
            rng.integers(0, 2, (5,)).astype(bool),
            rng.integers(-9, 9, (4, 3)).astype(np.int16))
    buf, layout = _pack_wire(host)
    assert buf.dtype == np.uint8
    out = jax.jit(lambda b: _unpack_wire(b, layout))(buf)
    for a, b in zip(host, out):
        assert a.dtype == np.asarray(b).dtype
        np.testing.assert_array_equal(a, np.asarray(b))


@pytest.mark.parametrize("device_data", [False, True])
def test_packed_wire_bit_exact_full_variant(device_data):
    t0, l0, _, _ = _train(False, device_data, ratio=0.6, epochs=2)
    t1, l1, _, _ = _train(True, device_data, ratio=0.6, epochs=2)
    np.testing.assert_array_equal(t0, t1)
    np.testing.assert_array_equal(l0, l1)


@pytest.mark.parametrize("device_data", [False, True])
def test_packed_wire_bit_exact_noflush_nopull(device_data):
    """cache_limit_ratio=1.0 + 3 epochs drives chunks through the
    flush-free AND pull-free packed programs; all three variants must
    match the unpacked wire bit-for-bit."""
    t0, l0, nf0, np0 = _train(False, device_data, ratio=1.0, epochs=3,
                              rows=600)
    t1, l1, nf1, np1 = _train(True, device_data, ratio=1.0, epochs=3,
                              rows=600)
    assert nf1 > 0 and np1 > 0, "variant programs were not exercised"
    assert (nf0, np0) == (nf1, np1)
    np.testing.assert_array_equal(t0, t1)
    np.testing.assert_array_equal(l0, l1)


def test_stage_chunk_returns_packed_single_buffer():
    """Single-shard staging must ship exactly ONE device array."""
    cfg = HeraldConfig(model="wdl_criteo", batch_size=B, embedding_dim=8,
                       comm_mode="local", cache_limit_ratio=0.6)
    model = get_model(cfg.model)
    dense, sparse, labels = synthetic_ctr_data(model.spec, B * 4, seed=1,
                                               num_rows=900)
    eng = CachedEngine(cfg, table_rows=900)
    planner = eng.make_planner(sparse, epochs=1, n_threads=1)
    staged = eng.stage_program_chunks(planner, 4,
                                      raw=(dense, sparse, labels))
    planner.close()
    variant, args = staged[0]
    assert isinstance(args, PackedChunk)
    assert args.buf.dtype == np.uint8 and args.buf.ndim == 1
    assert not args.idx


def _cli(extra, seed=5):
    common = ["--model", "wdl_criteo", "--comm", "local", "--scheduled",
              "--batch-size", "16", "--samples", "2560", "--rows", "3000",
              "--cache-limit-ratio", "0.5", "--lr", "0.5", "--nepoch", "2",
              "--scan-steps", "8", "--val-ratio", "0.2", "--seed",
              str(seed), "--device-data"]
    return run_training(build_parser().parse_args(common + extra))


def test_cli_prestage_bit_exact():
    r0 = _cli(["--prestage", "0"])
    r1 = _cli(["--prestage", "3", "--prestage-threads", "2"])
    assert r0["steps"] == r1["steps"]
    assert r0["train_loss_last"] == r1["train_loss_last"]
    assert r0["val_auc"] == r1["val_auc"]
    assert [e["val_auc"] for e in r0["epochs"]] \
        == [e["val_auc"] for e in r1["epochs"]]


def test_cli_prestage_serve_view_checkpoint_identical(tmp_path):
    """Mid-stream --ckpt-every + --ckpt-serve-view under --prestage:
    the serve overlay (host residency mirror -> synced dirty-row values)
    must equal the per-chunk path's bit-for-bit — i.e. the mirror
    advances with the EXECUTED stream, not the prestaged one."""
    from herald_tpu.train.checkpoint import load_extra
    outs = []
    for name, depth in (("a", "0"), ("b", "4")):
        ck = tmp_path / name
        _cli(["--prestage", depth, "--ckpt", str(ck),
              "--ckpt-every", "40", "--ckpt-serve-view",
              "--max-steps", "56"])
        ov = load_extra(str(ck), "serve_overlay")
        assert ov is not None
        outs.append(ov)
    a, b = outs
    assert set(a) == set(b)
    for k in a:
        np.testing.assert_array_equal(np.asarray(a[k]), np.asarray(b[k]),
                                      err_msg=k)


def _train_mesh(packed: bool, ratio: float, epochs: int, rows: int = 1200,
                device_data: bool = False):
    cfg = HeraldConfig(model="wdl_criteo", batch_size=B, embedding_dim=8,
                       comm_mode="hybrid", learning_rate=0.5,
                       cache_limit_ratio=ratio, sched_packed_wire=packed)
    model = get_model(cfg.model)
    n = B * 8 * STEPS
    dense, sparse, labels = synthetic_ctr_data(model.spec, n, seed=3,
                                               num_rows=rows)
    eng = CachedEngine(cfg, table_rows=rows)
    planner = eng.make_planner(sparse, epochs=epochs, n_threads=1)
    st = eng.init_cached_state(0)
    dd = (eng.stage_dataset(dense, sparse.astype(np.int32), labels)
          if device_data else None)
    losses = []
    while True:
        st, stats = eng.train_epoch_cached(st, planner, dense, sparse,
                                           labels, steps=6, device_data=dd)
        if stats is None:
            break
        losses.append(np.asarray(stats["loss"]))
    st = eng.sync_cache(st, planner)
    planner.close()
    return (np.asarray(st.table), np.concatenate(losses),
            eng.noflush_chunks, eng.nopull_chunks)


@pytest.mark.parametrize("device_data", [False, True])
def test_mesh_packed_wire_bit_exact(device_data):
    """8-device mesh (VERDICT r4 missing #6): the [nr, B] per-shard
    packed wire — one put per chunk, unpacked inside shard_map — must be
    bit-identical to the per-array puts across the full AND flush-free/
    pull-free variants."""
    if jax.device_count() < 8:
        pytest.skip("needs 8 virtual devices")
    t0, l0, nf0, np0 = _train_mesh(False, ratio=1.0, epochs=2,
                                   device_data=device_data)
    t1, l1, nf1, np1 = _train_mesh(True, ratio=1.0, epochs=2,
                                   device_data=device_data)
    # (remote readers keep forcing planned flushes on a mesh, so the
    # flush-free variant legitimately never fires here — the full
    # program is the one multi-shard production dispatches)
    assert (nf0, np0) == (nf1, np1)
    np.testing.assert_array_equal(t0, t1)
    np.testing.assert_array_equal(l0, l1)


def test_mesh_stage_chunk_single_sharded_buffer():
    """Mesh staging must ship ONE [nr, B] uint8 buffer row-sharded over
    the mesh axis (one transfer per process on multi-host)."""
    if jax.device_count() < 8:
        pytest.skip("needs 8 virtual devices")
    cfg = HeraldConfig(model="wdl_criteo", batch_size=B, embedding_dim=8,
                       comm_mode="hybrid", cache_limit_ratio=0.6)
    model = get_model(cfg.model)
    n = B * 8 * 4
    dense, sparse, labels = synthetic_ctr_data(model.spec, n, seed=1,
                                               num_rows=1200)
    eng = CachedEngine(cfg, table_rows=1200)
    planner = eng.make_planner(sparse, epochs=1, n_threads=1)
    staged = eng.stage_program_chunks(planner, 4,
                                      raw=(dense, sparse, labels))
    planner.close()
    variant, args = staged[0]
    assert isinstance(args, PackedChunk) and args.mesh
    assert args.buf.dtype == np.uint8
    assert args.buf.shape[0] == 8
    from jax.sharding import PartitionSpec
    assert args.buf.sharding.spec == PartitionSpec(eng.axis, None)


def _train_memo(memo: bool, memo_mb: int = 256, epochs: int = 3):
    """3 epochs over a fixed fully-cacheable stream: epochs 2+ re-plan
    byte-identical programs, the staged-chunk memo's target regime."""
    cfg = HeraldConfig(model="wdl_criteo", batch_size=B, embedding_dim=8,
                       comm_mode="local", learning_rate=0.5,
                       cache_limit_ratio=1.0, sched_chunk_memo=memo,
                       sched_chunk_memo_mb=memo_mb)
    model = get_model(cfg.model)
    dense, sparse, labels = synthetic_ctr_data(model.spec, B * STEPS,
                                               seed=9, num_rows=600)
    eng = CachedEngine(cfg, table_rows=600)
    planner = eng.make_planner(sparse, epochs=epochs, n_threads=1)
    st = eng.init_cached_state(0)
    dd = eng.stage_dataset(dense, sparse.astype(np.int32), labels)
    losses = []
    while True:
        st, stats = eng.train_epoch_cached(st, planner, dense, sparse,
                                           labels, steps=6,
                                           device_data=dd)
        if stats is None:
            break
        losses.append(np.asarray(stats["loss"]))
    st = eng.sync_cache(st, planner)
    planner.close()
    return np.asarray(st.table), np.concatenate(losses), eng.memo_hits


def test_chunk_memo_hits_and_stays_bit_exact():
    """Epoch-repeat streams must HIT the memo (puts elided) and train
    bit-identically to the memo-off run — reuse is gated on a full
    memcmp of the packed bytes, so this is exactness by construction."""
    t1, l1, h1 = _train_memo(True)
    t0, l0, h0 = _train_memo(False)
    assert h0 == 0
    # 3 epochs x 4 chunks: epoch 1 plans cold programs; at least the
    # epoch-3 chunks must replay epoch 2's bytes verbatim
    assert h1 >= 4, f"expected steady-state memo hits, got {h1}"
    np.testing.assert_array_equal(t0, t1)
    np.testing.assert_array_equal(l0, l1)


def test_chunk_memo_budget_overflow_disables():
    """A stream whose distinct programs exceed the budget must disable
    the memo (no thrash) and still train bit-exactly."""
    t1, l1, h1 = _train_memo(True, memo_mb=0)
    t0, l0, h0 = _train_memo(False)
    assert h0 == 0 and h1 == 0
    np.testing.assert_array_equal(t0, t1)
    np.testing.assert_array_equal(l0, l1)


def test_mesh_chunk_memo_reuses_identical_buffers():
    """The memo must also cover the MESH packed wire (multi-host runs
    pay the same per-put dispatch wall). Multi-worker planning does not
    reach an epoch-periodic fixed point (assignment rides evolving
    affinity/LRU state), so this pins the MECHANISM directly: staging
    the same popped chunk twice must return the identical staged object
    (put elided), and a one-byte perturbation must miss — the full
    memcmp, not the sampled key, decides reuse."""
    if jax.device_count() < 8:
        pytest.skip("needs 8 virtual devices")
    cfg = HeraldConfig(model="wdl_criteo", batch_size=B, embedding_dim=8,
                       comm_mode="hybrid", cache_limit_ratio=0.6)
    model = get_model(cfg.model)
    n = B * 8 * 4
    dense, sparse, labels = synthetic_ctr_data(model.spec, n, seed=1,
                                               num_rows=1200)
    eng = CachedEngine(cfg, table_rows=1200)
    planner = eng.make_planner(sparse, epochs=1, n_threads=1)
    out = planner.pop_chunk(4)
    K = out[0]
    stage = lambda: eng._stage_chunk(
        K, *out[1:], dense, sparse, labels, index_feed=False)
    v1, s1 = stage()
    v2, s2 = stage()
    assert eng.memo_hits == 1 and s2 is s1 and v2 == v1
    assert isinstance(s1, PackedChunk) and s1.mesh
    # perturb one byte of the flush ids: must MISS (full-compare gate)
    out[5][0, 0] ^= 1
    v3, s3 = stage()
    assert eng.memo_hits == 1 and s3 is not s1
    planner.close()


def test_chunk_memo_collided_key_churn_disables():
    """Streams whose programs mutate under a constant cap-padded layout
    collide on the sampled key every chunk: the replace must count as
    churn so the 4x-budget no-reuse guard can trip (without this, such
    a stream pays a full memcmp per chunk forever and pins the budget
    in host RAM + HBM with zero hits — the measured big-stream case)."""
    cfg = HeraldConfig(model="wdl_criteo", batch_size=B, embedding_dim=8,
                       comm_mode="local", cache_limit_ratio=0.6,
                       sched_chunk_memo_mb=1)
    eng = CachedEngine(cfg, table_rows=900)
    layout = (((1 << 20,), "|u1"),)
    for i in range(1, 8):
        buf = np.zeros(1 << 20, np.uint8)
        buf[1000] = i          # same first/last 64 bytes, same size
        eng._memo_stage(2, buf, layout, False,
                        lambda b: jax.device_put(b), mesh=False)
        if not eng._memo_on:
            break
    assert not eng._memo_on, "collided-key churn never tripped the guard"
    assert eng.memo_hits == 0 and not eng._chunk_memo
