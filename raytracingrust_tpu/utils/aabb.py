"""Axis-aligned bounding boxes.

Two faces:
  * Host-side NumPy helpers used by the BVH builder (SoA over ``(N, 3)``
    min/max arrays) — the reference's ``lib/utils/aabb.rs`` object methods,
    vectorized.
  * A device-side batched slab test used by the stackless BVH traversal.

The reference's slab test (lib/utils/aabb.rs:81-137) recomputes ``1/d`` per
axis per call; ours takes a precomputed inverse direction (one reciprocal per
ray per bounce).  The reference's ``is_empty`` quirk (Q2 — returns the
opposite of its name) is intentionally not reproduced.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------- host side

def surround(min_a, max_a, min_b, max_b):
    """AABB::surround (lib/utils/aabb.rs:40-53), SoA."""
    return np.minimum(min_a, min_b), np.maximum(max_a, max_b)


def centroid(mins, maxs):
    """AABB::centroid (lib/utils/aabb.rs:27-29)."""
    return (mins + maxs) * 0.5


def epsilon_expand(mins, maxs, eps):
    """AABB::epsilon_expand (lib/utils/aabb.rs:56-77): per-axis, if the box is
    thinner than ``eps``, grow it to ``centroid +- eps``."""
    dims = maxs - mins
    c = centroid(mins, maxs)
    thin = dims < eps
    mins = np.where(thin, c - eps, mins)
    maxs = np.where(thin, c + eps, maxs)
    return mins, maxs


def reduce_surround(mins, maxs):
    """Bounds of a whole collection -> ((3,), (3,))."""
    if len(mins) == 0:
        return np.zeros(3, np.float32), np.zeros(3, np.float32)
    return mins.min(axis=0), maxs.max(axis=0)


# -------------------------------------------------------------- device side

def slab_hit(box_min, box_max, origin, inv_dir, tmin, tmax):
    """Batched ray/AABB slab test.

    Semantics of AABB::hit (lib/utils/aabb.rs:81-137): shrink (tmin, tmax) by
    each axis slab, miss when ``tmax <= tmin``.  With IEEE inf semantics the
    branchless min/max form is equivalent for non-degenerate boxes (and our
    builder epsilon-expands degenerate ones).

    Shapes broadcast: e.g. box_* (..., 3), origin/inv_dir (..., 3).
    Returns (hit_mask, t_entry).
    """
    t0 = (box_min - origin) * inv_dir
    t1 = (box_max - origin) * inv_dir
    lo = jnp.minimum(t0, t1)
    hi = jnp.maximum(t0, t1)
    entry = jnp.maximum(jnp.max(lo, axis=-1), tmin)
    exit_ = jnp.minimum(jnp.min(hi, axis=-1), tmax)
    return exit_ > entry, entry
