"""Stackless flat-BVH traversal, lockstep over a ray wavefront.

This is the completed form of the traversal the reference left as comments
(``LinearBvhTree``, lib/core/bvh.rs:201-293): every ray carries a single node
cursor into the DFS-ordered node array; one while-loop iteration advances all
rays one node — AABB hit descends (hit_link), miss skips the subtree
(miss_link), leaves test their primitive and continue at the skip link.  No
recursion, no stack, uniform control flow; divergence shows up only as rays
finishing at different iteration counts.

Improvements over the reference traversal, both result-identical:
  * ordered t-pruning — the slab test uses the current best t as tmax
    (the reference recurses into both children unconditionally, quirk Q4);
  * one reciprocal per ray instead of 1/d per axis per AABB test.

Volume primitives consume the same per-(ray, volume-ordinal) uniform as the
brute-force path, so BVH and linear scan produce bitwise-identical renders —
the reference's A/B eyeball check (src/gui.rs:281-288) becomes an exact
assert in tests/test_bvh.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..utils import aabb, vec
from ..utils.types import INF, T_MIN
from .intersect import Hit, make_hit, prim_t


def intersect_bvh(scene, o, d, u_vol, tmin=T_MIN) -> Hit:
    """Closest hit via the flat skip-link BVH -> Hit."""
    k = len(scene.bvh)
    # Traversal is control flow, not math: detach its inputs so the
    # while_loop never sees differentiable operands (reverse-mode AD cannot
    # transpose while_loop; the detached-sampling estimator detaches hit
    # geometry anyway).  make_hit below re-attaches o and d.
    o_, d_ = jax.lax.stop_gradient((o, d))
    u_vol = jax.lax.stop_gradient(u_vol)
    scene_ = jax.lax.stop_gradient(scene)
    bvh = scene_.bvh
    inv_d = 1.0 / d_

    def cond(state):
        node, _, _ = state
        return jnp.any(node < k)

    def body(state):
        node, t_best, best = state
        active = node < k
        ni = jnp.minimum(node, k - 1)
        box_hit, _ = aabb.slab_hit(
            bvh.node_min[ni], bvh.node_max[ni], o_, inv_d, tmin, t_best
        )
        box_hit = box_hit & active
        prim = bvh.prim[ni]
        leaf = prim >= 0

        t_p = prim_t(scene_, prim, o_, d_, u_vol, tmin, t_best)
        better = box_hit & leaf & (t_p < t_best)
        t_best = jnp.where(better, t_p, t_best)
        best = jnp.where(better, prim, best)

        nxt = jnp.where(box_hit, bvh.hit_link[ni], bvh.miss_link[ni])
        node = jnp.where(active, nxt, node)
        return node, t_best, best

    r = o.shape[0]
    init = (
        jnp.zeros(r, jnp.int32),
        jnp.full(r, INF),
        jnp.full(r, -1, jnp.int32),
    )
    _, t_loop, best = jax.lax.while_loop(cond, body, init)

    # Differentiable re-intersection of the WINNER: the while_loop only
    # decided WHICH primitive is hit (discrete, detached); the hit distance
    # is recomputed outside the loop from differentiable scene/ray arrays so
    # gradients flow through t -> hit.point -> the bounce chain
    # (reparameterized path gradients; tmax=inf provably selects the same
    # root for the winning primitive).
    winner = jnp.maximum(best, 0)
    t = prim_t(scene, winner, o, d, u_vol, tmin, INF)
    t = jnp.where(best >= 0, t, INF)
    return make_hit(scene, o, d, t, winner)
