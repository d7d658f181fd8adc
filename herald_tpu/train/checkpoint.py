"""Multi-host-safe checkpoint save/load.

Replaces the reference's `Executor.save/load`
(`python/hetu/gpu_ops/executor.py:433-498`: SaveParam/LoadParam RPCs; the
PS writes each shard server-side,
`ps-lite/include/ps/server/PSFHandle.h:401-439`). The TPU analog of
"server-side save" is **per-process shard dumps**: every process writes
only its addressable shards (no host gather — a multi-host table never
fits through one host), process 0 writes replicated leaves + manifest.

Layout under <path>/:
    manifest.json      state type, leaf shapes/dtypes/layout, mesh info
    replicated.npz     fully-replicated leaves (process 0)
    shards.p<i>.npz    process i's addressable blocks (keys b0, b1, ...)
    blocks.p<i>.json   block metadata: leaf key + global offsets per block

Restore assembles each target shard from whichever saved blocks cover its
global index range, so it works across process counts; a checkpoint
restores bit-exactly onto an engine with the same num_shards. Across
SHARD counts (pod resize), the table leaves remap automatically through
the strided logical->physical layout (parallel/exchange.py) — elastic
scale up/down for plain TrainStates; cached states must sync_cache and
convert first (cache arrays are planner-topology-specific).

Unlike the reference (which checkpoints only parameters), optimizer slots
and the step counter round-trip too.
"""

from __future__ import annotations

import json
import os
from typing import Dict, List, Tuple, Union

import jax
import numpy as np

from herald_tpu.train.engine import TrainState
from herald_tpu.train.cached import CachedTrainState

_STATE_TYPES = {"TrainState": TrainState,
                "CachedTrainState": CachedTrainState}


def _leaf_items(state):
    flat, treedef = jax.tree_util.tree_flatten_with_path(state)
    items = []
    for path, leaf in flat:
        # GetAttrKey carries .name, DictKey .key, SequenceKey .idx
        key = "/".join(str(getattr(p, "name",
                                   getattr(p, "key",
                                           getattr(p, "idx", p))))
                       for p in path)
        items.append((key, leaf))
    return items, treedef


def _is_sharded(leaf) -> bool:
    sh = getattr(leaf, "sharding", None)
    return (isinstance(leaf, jax.Array) and sh is not None
            and not sh.is_fully_replicated)


def _bounds(index, shape) -> List[Tuple[int, int]]:
    """Normalize a shard index (tuple of slices) to [(start, stop)] per
    dim."""
    out = []
    for sl, dim in zip(index, shape):
        s, e, step = sl.indices(dim)
        assert step == 1, "strided shard indices are not supported"
        out.append((s, e))
    return out


def save_checkpoint(state: Union[TrainState, CachedTrainState],
                    path: str, extras: Dict[str, Dict] = None) -> None:
    """Every process must call this (collectively); each writes only its
    own addressable shards.

    Crash-safe by versioning: each save writes into <path>/v<step>/ and
    process 0 atomically repoints <path>/LATEST only after every file
    (barrier in multi-process runs) — a crash mid-save leaves the
    previous complete checkpoint intact, which is exactly the window the
    elastic supervisor restarts in (launch/supervise.py).

    `extras` ({name: {key: np.ndarray}}) are sidecar npz files written by
    process 0 into the same version dir BEFORE LATEST flips (same crash
    safety) — e.g. the serve overlay (CachedEngine.serve_overlay)."""
    pidx = jax.process_index()
    items, _ = _leaf_items(state)
    step_leaf = next((leaf for k, leaf in items
                      if k.lstrip(".") == "step"), None)
    assert step_leaf is not None, "state has no step counter"
    version = f"v{int(np.asarray(step_leaf))}"
    vdir = os.path.join(path, version)
    os.makedirs(vdir, exist_ok=True)

    blocks: Dict[str, np.ndarray] = {}
    block_meta = []
    replicated: Dict[str, np.ndarray] = {}
    layout: Dict[str, str] = {}
    shapes: Dict[str, list] = {}
    dtypes: Dict[str, str] = {}
    for key, leaf in items:
        arr_shape = tuple(np.shape(leaf))
        shapes[key] = list(arr_shape)
        dtypes[key] = str(np.asarray(leaf).dtype
                          if not isinstance(leaf, jax.Array)
                          else leaf.dtype)
        if _is_sharded(leaf):
            layout[key] = "sharded"
            seen = set()
            for sh in leaf.addressable_shards:
                if sh.replica_id != 0:
                    continue   # one copy per distinct block
                b = tuple(_bounds(sh.index, arr_shape))
                if b in seen:
                    continue
                seen.add(b)
                fk = f"b{len(block_meta)}"
                blocks[fk] = np.asarray(sh.data)
                block_meta.append({"key": key, "file_key": fk,
                                   "offsets": [list(x) for x in b]})
        else:
            layout[key] = "replicated"
            if pidx == 0:
                replicated[key] = np.asarray(leaf)

    def write_atomic(name, writer):
        tmp = os.path.join(vdir, name + ".tmp")
        writer(tmp)
        os.replace(tmp, os.path.join(vdir, name))

    write_atomic(f"shards.p{pidx}.npz",
                 lambda t: np.savez(open(t, "wb"), **blocks))
    write_atomic(f"blocks.p{pidx}.json",
                 lambda t: json.dump(block_meta, open(t, "w")))
    if pidx == 0:
        write_atomic("replicated.npz",
                     lambda t: np.savez(open(t, "wb"), **replicated))
        for name, arrs in (extras or {}).items():
            write_atomic(f"{name}.npz",
                         lambda t, a=arrs: np.savez(open(t, "wb"), **a))
        manifest = {
            "state_type": type(state).__name__,
            "num_processes": jax.process_count(),
            "layout": layout, "shapes": shapes, "dtypes": dtypes,
        }
        write_atomic("manifest.json",
                     lambda t: json.dump(manifest, open(t, "w"), indent=2))
    if jax.process_count() > 1:
        # all shard files must exist before LATEST flips
        from jax.experimental import multihost_utils as mhu
        mhu.sync_global_devices(f"herald_ckpt_{version}")
    if pidx == 0:
        tmp = os.path.join(path, "LATEST.tmp")
        with open(tmp, "w") as f:
            f.write(version)
        os.replace(tmp, os.path.join(path, "LATEST"))
        # keep only the live version + its predecessor (bounded disk;
        # the predecessor guards against a torn CURRENT discovered late)
        import shutil
        versions = sorted(
            (d for d in os.listdir(path)
             if d.startswith("v") and d[1:].isdigit()),
            key=lambda d: int(d[1:]))
        for old in versions[:-2]:
            shutil.rmtree(os.path.join(path, old), ignore_errors=True)


class _BlockReader:
    """Assembles arbitrary global index ranges from the saved blocks."""

    def __init__(self, path: str, num_processes: int):
        self.path = path
        self.meta: Dict[str, list] = {}
        self._npz: Dict[int, "np.lib.npyio.NpzFile"] = {}
        for p in range(num_processes):
            with open(os.path.join(path, f"blocks.p{p}.json")) as f:
                for m in json.load(f):
                    self.meta.setdefault(m["key"], []).append(
                        (p, m["file_key"],
                         [tuple(x) for x in m["offsets"]]))

    def _file(self, p: int):
        if p not in self._npz:
            self._npz[p] = np.load(
                os.path.join(self.path, f"shards.p{p}.npz"))
        return self._npz[p]

    def read(self, key: str, bounds: List[Tuple[int, int]],
             dtype) -> np.ndarray:
        out = np.empty([e - s for s, e in bounds], dtype)
        filled = 0
        for p, fk, offs in self.meta.get(key, []):
            inter = []
            ok = True
            for (ts, te), (bs, be) in zip(bounds, offs):
                s, e = max(ts, bs), min(te, be)
                if s >= e:
                    ok = False
                    break
                inter.append((s, e))
            if not ok:
                continue
            data = self._file(p)[fk]
            src = tuple(slice(s - bs, e - bs)
                        for (s, e), (bs, _) in zip(inter, offs))
            dst = tuple(slice(s - ts, e - ts)
                        for (s, e), (ts, _) in zip(inter, bounds))
            out[dst] = data[src]
            filled += int(np.prod([e - s for s, e in inter]))
        if filled < int(np.prod(out.shape)):
            raise ValueError(
                f"checkpoint blocks do not cover leaf {key!r} range "
                f"{bounds} (covered {filled} of {np.prod(out.shape)})")
        return out


def _remap_rows(full_src, s_src, shape, s_dst, dtype):
    """Cross-topology remap of a strided-layout row leaf.

    The strided ownership map (parallel/exchange.py: logical row r lives
    at physical slot (r % S) * rps + r // S; S=1 is the identity) makes a
    pod resize a pure index permutation: recover the logical view from
    the SOURCE topology and lay it out for the target. Host-side assembly
    of the full leaf — a resize is an offline operation (8.6 GB for the
    reference table; fits host RAM).
    """
    rps_src = full_src.shape[0] // s_src
    rps_dst = shape[0] // s_dst
    q = np.arange(shape[0])
    r = (q % rps_dst) * s_dst + q // rps_dst          # target logical ids
    p_src = (r % s_src) * rps_src + r // s_src        # source physical
    valid = r < s_src * rps_src
    out = np.zeros(shape, dtype)
    out[valid] = full_src[p_src[valid]]
    return out


def load_checkpoint(path: str, like: Union[TrainState, CachedTrainState]
                    ) -> Union[TrainState, CachedTrainState]:
    """Load into the structure/shardings of `like` (an initialized state).
    Every process calls this; each materializes only its own shards.
    Follows <path>/LATEST to the newest COMPLETE version directory
    (legacy flat layouts load directly).

    Cross-topology restore: a TrainState saved under a different shard
    count loads via a strided-layout remap of the table leaves (pod
    resize = elastic scale up/down). Cached states must be synced and
    converted first (the cache arrays are planner-topology-specific)."""
    latest = os.path.join(path, "LATEST")
    if os.path.exists(latest):
        with open(latest) as f:
            path = os.path.join(path, f.read().strip())
    with open(os.path.join(path, "manifest.json")) as f:
        manifest = json.load(f)
    assert manifest["state_type"] == type(like).__name__, (
        f"checkpoint holds {manifest['state_type']}, "
        f"expected {type(like).__name__}")
    reader = _BlockReader(path, int(manifest["num_processes"]))
    repl_path = os.path.join(path, "replicated.npz")
    if not os.path.exists(repl_path):
        # a manifest without its replicated leaves means this process can
        # only see part of the checkpoint (per-host local disks instead of
        # shared storage): fail with the cause, not a KeyError on the
        # first dense-param leaf much later
        raise FileNotFoundError(
            f"checkpoint {path!r} has a manifest but no replicated.npz — "
            f"multi-host checkpoints must live on storage shared by every "
            f"process (each process writes its own shard blocks and the "
            f"leader writes replicated.npz; all must be readable here)")
    repl = np.load(repl_path)

    items, treedef = _leaf_items(like)
    new_leaves = []
    for key, leaf in items:
        shape = tuple(np.shape(leaf))
        saved_shape = tuple(manifest["shapes"][key])
        saved_sharded = manifest["layout"][key] == "sharded"
        dtype = np.asarray(leaf).dtype if not isinstance(leaf, jax.Array) \
            else leaf.dtype
        # topology comparison: saved shard count from the block metadata
        # (a non-sharded save is S=1; shape equality alone can coincide
        # across shard counts)
        s_src = (len({offs[0][0]
                      for _, _, offs in reader.meta.get(key, [])})
                 if saved_sharded else 1)
        s_dst = (shape[0] // leaf.sharding.shard_shape(shape)[0]
                 if _is_sharded(leaf) else 1) if np.ndim(leaf) else 1
        table_like = key.lstrip(".") == "table" \
            or key.lstrip(".").startswith("table_slots")
        if table_like and (s_src != s_dst or shape != saved_shape):
            # pod resize: remap the strided table leaves
            if shape[1:] != saved_shape[1:]:
                raise ValueError(
                    f"leaf {key!r}: width changed across checkpoints "
                    f"({saved_shape} -> {shape})")
            if saved_sharded:
                full_src = reader.read(
                    key, [(0, d) for d in saved_shape], dtype)
            else:
                full_src = repl[key].astype(dtype)
            arr = _remap_rows(full_src, s_src, shape, s_dst, dtype)
            sharding = getattr(leaf, "sharding", None)
            if sharding is not None:
                new_leaves.append(jax.make_array_from_callback(
                    shape, sharding, lambda idx, a=arr: a[idx]))
            else:
                new_leaves.append(arr)
            continue
        if shape != saved_shape:
            raise ValueError(
                f"leaf {key!r} cannot restore across topologies "
                f"({saved_shape} -> {shape}); for cached states, "
                f"sync_cache and checkpoint a plain TrainState "
                f"before resizing the pod")
        if _is_sharded(leaf):
            if saved_sharded:
                def cb(idx, key=key, shape=shape, dtype=dtype):
                    return reader.read(key, _bounds(idx, shape), dtype)
            else:
                full = repl[key].astype(dtype)

                def cb(idx, full=full):
                    return full[idx]
            new_leaves.append(jax.make_array_from_callback(
                shape, leaf.sharding, cb))
        else:
            if saved_sharded:
                arr = reader.read(key, [(0, d) for d in shape], dtype)
            else:
                arr = repl[key].astype(dtype)
            sharding = getattr(leaf, "sharding", None)
            if sharding is not None:
                new_leaves.append(jax.device_put(arr, sharding))
            else:
                new_leaves.append(arr.astype(dtype))
    return jax.tree_util.tree_unflatten(treedef, new_leaves)


def load_extra(path: str, name: str):
    """Read a sidecar npz written via save_checkpoint(extras=...) from
    the checkpoint at `path` (a version dir, or a root whose LATEST is
    followed). Returns {key: np.ndarray} or None if absent."""
    latest = os.path.join(path, "LATEST")
    if os.path.exists(latest):
        with open(latest) as f:
            path = os.path.join(path, f.read().strip())
    f = os.path.join(path, f"{name}.npz")
    if not os.path.exists(f):
        return None
    with np.load(f) as z:
        return {k: z[k] for k in z.files}


def apply_serve_overlay(state: TrainState, overlay: Dict) -> TrainState:
    """Patch a base-view TrainState with a serve overlay
    (CachedEngine.serve_overlay): the synced values of the rows whose
    deltas were still parked in the cache at save time, plus the pinned
    hot block. The result scores identically to a post-sync_cache state
    (see cached.py serve_overlay for the exact-optimizer caveats)."""
    import jax.numpy as jnp  # local: checkpoint.py stays import-light
    rows = np.asarray(overlay["rows"], np.int64)
    hot_rows = np.asarray(overlay.get("hot_rows", np.zeros(0, np.int64)),
                          np.int64)
    if not len(rows) and not len(hot_rows):
        return state

    def patch(arr, idx, vals):
        return jax.jit(
            lambda a, v: a.at[jnp.asarray(idx)].set(
                v.astype(a.dtype), mode="drop"),
            donate_argnums=(0,))(arr, jnp.asarray(vals))

    table = state.table
    slots = dict(state.table_slots)
    if len(rows):
        table = patch(table, rows, overlay["values"])
        for k in slots:
            sk = overlay.get(f"slot/{k}")
            if sk is not None:
                slots[k] = patch(slots[k], rows, sk)
    if len(hot_rows):
        table = patch(table, hot_rows, overlay["hot_values"])
    return state._replace(table=table, table_slots=slots)
