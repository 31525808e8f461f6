"""Checkpoint / resume for chain states, PRNG keys and statistics.

The reference has no resumption capability — ``SampleState::save_to_disk``
(samplestate.hh:45) dumps states for inspection only (SURVEY.md §5).  Here
any pytree (sampler states, TwoLevelState caches, StatsState accumulators,
PRNG keys) round-trips through a single ``.npz`` file: leaves are stored as
named numpy arrays and the tree structure is rebuilt against a template
with the same structure (``like=``), so restore works on any host/device
topology — restored arrays are placed like the template's.
"""

from __future__ import annotations

import json
from pathlib import Path

import jax
import numpy as np


def save_checkpoint(path, pytree, metadata: dict | None = None) -> None:
    """Write all array leaves of ``pytree`` (+ optional JSON metadata)."""
    leaves, treedef = jax.tree.flatten(pytree)
    arrays = {f"leaf_{i}": np.asarray(leaf) for i, leaf in enumerate(leaves)}
    arrays["__meta__"] = np.frombuffer(
        json.dumps({"n_leaves": len(leaves),
                    "treedef": str(treedef),
                    "metadata": metadata or {}}).encode(), dtype=np.uint8)
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    with open(path, "wb") as fh:
        np.savez(fh, **arrays)


def load_checkpoint(path, like):
    """Restore a pytree with the structure (and device placement) of
    ``like``; raises if the leaf count or shapes mismatch."""
    with np.load(path) as data:
        meta = json.loads(bytes(data["__meta__"].tobytes()).decode())
        leaves = [data[f"leaf_{i}"] for i in range(meta["n_leaves"])]
    like_leaves, treedef = jax.tree.flatten(like)
    if len(like_leaves) != len(leaves):
        raise ValueError(
            f"checkpoint has {len(leaves)} leaves, template has "
            f"{len(like_leaves)} (saved structure: {meta['treedef']})")
    placed = []
    for tmpl, arr in zip(like_leaves, leaves):
        tmpl_arr = jax.numpy.asarray(tmpl)
        if tuple(tmpl_arr.shape) != tuple(arr.shape):
            raise ValueError(
                f"leaf shape mismatch: checkpoint {arr.shape} vs template "
                f"{tmpl_arr.shape}")
        out = jax.numpy.asarray(arr, dtype=tmpl_arr.dtype)
        if hasattr(tmpl_arr, "sharding"):
            out = jax.device_put(out, tmpl_arr.sharding)
        placed.append(out)
    return jax.tree.unflatten(treedef, placed)


def checkpoint_metadata(path) -> dict:
    with np.load(path) as data:
        meta = json.loads(bytes(data["__meta__"].tobytes()).decode())
    return meta.get("metadata", {})
