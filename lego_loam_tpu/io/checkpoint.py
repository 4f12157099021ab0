"""Checkpoint / resume — pytree state snapshots.

The reference keeps all state in RAM with no save/load (SURVEY.md §5);
for long multi-session runs we checkpoint the full ``SlamState`` pytree
(keyframe store, factor graph, odometry state) to a single .npz and
restore it bit-exactly, which is what makes elastic multi-host replay and
mid-sequence restart possible.
"""

from __future__ import annotations

from typing import Any

import numpy as np

import jax


def _flatten_with_paths(tree: Any):
    flat, treedef = jax.tree_util.tree_flatten_with_path(tree)
    keys = ["/".join(str(k) for k in path) for path, _ in flat]
    leaves = [leaf for _, leaf in flat]
    return keys, leaves, treedef


def save_state(path: str, state: Any) -> None:
    keys, leaves, _ = _flatten_with_paths(state)
    data = {f"leaf_{i}": np.asarray(v) for i, v in enumerate(leaves)}
    data["keys"] = np.asarray(keys, dtype=object)
    np.savez_compressed(path, **data, allow_pickle=True)


def load_state(path: str, template: Any) -> Any:
    """Restore a checkpoint into the structure of ``template`` (any state
    pytree with the same shape/dtype layout, e.g. ``init_state(cfg)``)."""
    keys_t, leaves_t, treedef = _flatten_with_paths(template)
    with np.load(path, allow_pickle=True) as z:
        keys_s = list(z["keys"])
        if keys_s != keys_t:
            raise ValueError(
                "checkpoint layout mismatch: "
                f"saved {len(keys_s)} leaves, template {len(keys_t)}")
        leaves = []
        for i, (tmpl, key) in enumerate(zip(leaves_t, keys_t)):
            arr = z[f"leaf_{i}"]
            want = np.asarray(tmpl)
            if arr.shape != want.shape or arr.dtype != want.dtype:
                raise ValueError(
                    f"leaf {key}: saved {arr.shape}/{arr.dtype} != "
                    f"template {want.shape}/{want.dtype}")
            leaves.append(jax.numpy.asarray(arr))
    return jax.tree_util.tree_unflatten(treedef, leaves)
