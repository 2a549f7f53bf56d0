"""Checkpoint/resume for long-running optimization and progressive renders.

The reference's only persistence is whole-scene JSON (SURVEY.md section 5
checkpoint bullet); every render starts from zero.  Here both long-running
loops are restartable:

  * inverse rendering — params + Adam state + step counter,
  * progressive rendering — the radiance accumulator + sample counter.

Storage is a plain ``.npz`` of the flattened pytree (no framework lock-in;
orbax would be overkill for two small dicts) with an atomic rename so a
killed process never leaves a torn checkpoint.
"""

from __future__ import annotations

import os

import jax
import numpy as np


def save(path: str, tree) -> None:
    """Atomically write a pytree of arrays to ``path`` (.npz)."""
    leaves, treedef = jax.tree.flatten(tree)
    payload = {f"leaf_{i}": np.asarray(x) for i, x in enumerate(leaves)}
    payload["treedef"] = np.frombuffer(
        repr(treedef).encode(), dtype=np.uint8
    )
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        np.savez(f, **payload)
    os.replace(tmp, path)


def load(path: str, like):
    """Load a pytree saved by :func:`save`, shaped like ``like``.

    Returns None when the file is absent or does not match ``like``'s
    structure/shapes (e.g. checkpoint from an older run).
    """
    if not os.path.exists(path):
        return None
    try:
        with np.load(path) as data:
            leaves, treedef = jax.tree.flatten(like)
            loaded = [data[f"leaf_{i}"] for i in range(len(leaves))]
        for a, b in zip(loaded, leaves):
            if tuple(a.shape) != tuple(np.shape(b)):
                return None
        return jax.tree.unflatten(treedef, loaded)
    except Exception:
        return None
