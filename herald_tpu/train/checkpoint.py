"""Checkpoint save/load.

Replaces the reference's `Executor.save/load`
(`python/hetu/gpu_ops/executor.py:433-498`: SaveParam/LoadParam RPCs writing
raw binary per param + worker-0 pickles). Here the whole TrainState pytree
(including optimizer slots and the step counter, which the reference does
NOT checkpoint — noted gap in SURVEY.md §5) is written as one .npz plus a
JSON manifest; sharded arrays are gathered host-side and re-sharded on load
against the engine's shardings.
"""

from __future__ import annotations

import json
import os
from typing import Any, Union

import jax
import numpy as np

from herald_tpu.train.engine import TrainState
from herald_tpu.train.cached import CachedTrainState

_STATE_TYPES = {"TrainState": TrainState,
                "CachedTrainState": CachedTrainState}


def _flatten_with_paths(state):
    flat, treedef = jax.tree_util.tree_flatten_with_path(state)
    items = {}
    for path, leaf in flat:
        key = "/".join(str(getattr(p, "key", getattr(p, "idx", p)))
                       for p in path)
        items[key] = np.asarray(leaf)
    return items, treedef


def save_checkpoint(state: Union[TrainState, CachedTrainState],
                    path: str) -> None:
    os.makedirs(path, exist_ok=True)
    items, _ = _flatten_with_paths(state)
    np.savez(os.path.join(path, "state.npz"), **items)
    manifest = {
        "state_type": type(state).__name__,
        "keys": sorted(items.keys()),
        "shapes": {k: list(v.shape) for k, v in items.items()},
        "dtypes": {k: str(v.dtype) for k, v in items.items()},
    }
    with open(os.path.join(path, "manifest.json"), "w") as f:
        json.dump(manifest, f, indent=2)


def load_checkpoint(path: str, like: Union[TrainState, CachedTrainState]
                    ) -> Union[TrainState, CachedTrainState]:
    """Load into the structure/shardings of `like` (an initialized state)."""
    with open(os.path.join(path, "manifest.json")) as f:
        manifest = json.load(f)
    assert manifest["state_type"] == type(like).__name__, (
        f"checkpoint holds {manifest['state_type']}, "
        f"expected {type(like).__name__}")
    data = np.load(os.path.join(path, "state.npz"))
    items, treedef = _flatten_with_paths(like)
    new_leaves = []
    flat, _ = jax.tree_util.tree_flatten_with_path(like)
    for path_key, leaf in flat:
        key = "/".join(str(getattr(p, "key", getattr(p, "idx", p)))
                       for p in path_key)
        arr = data[key]
        assert arr.shape == leaf.shape, (key, arr.shape, leaf.shape)
        sharding = getattr(leaf, "sharding", None)
        if sharding is not None:
            new_leaves.append(jax.device_put(arr.astype(leaf.dtype),
                                             sharding))
        else:
            new_leaves.append(arr.astype(leaf.dtype))
    return jax.tree_util.tree_unflatten(treedef, new_leaves)
