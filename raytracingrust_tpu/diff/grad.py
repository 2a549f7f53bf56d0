"""Differentiable rendering: parameter plumbing + loss/grad helpers.

The renderer is an ordinary JAX program over the Scene pytree, so
``jax.grad`` works directly; this module provides the bookkeeping for
selecting WHICH leaves are trainable (BASELINE.json north star: material
albedo / fuzz / ir, emission, camera pose/FoV, background colors) and
swapping them into a base scene.

Gradient estimator: reparameterized path gradients with detached discrete
events (fixed-seed uniforms are constants, sampled directions are smooth in
the parameters) — AD matches finite differences of the fixed-seed renderer
away from visibility/branch discontinuities; geometry-edge (silhouette)
gradients are out of scope (SURVEY.md section 7 hard part b).
"""

from __future__ import annotations

import dataclasses
from typing import Iterable

import jax
import jax.numpy as jnp

from ..models.scene import Scene
from ..render.render import render_linear

# Trainable leaf names -> (sub-pytree, field) paths
PARAM_PATHS = {
    "albedo": ("materials", "albedo"),
    "fuzz": ("materials", "fuzz"),
    "ir": ("materials", "ir"),
    "emission": ("materials", "emission"),
    "mix_factor": ("materials", "mix_factor"),
    "bg_color_a": ("background", "color_a"),
    "bg_color_b": ("background", "color_b"),
    "cam_lookfrom": ("camera", "lookfrom"),
    "cam_lookat": ("camera", "lookat"),
    "cam_up": ("camera", "vertical"),
    "cam_fov": ("camera", "vertical_fov"),
    "sphere_center": ("spheres", "center"),
    "sphere_radius": ("spheres", "radius"),
}


def extract_params(scene: Scene, names: Iterable[str]) -> dict:
    """Pull the selected trainable leaves out of a scene -> params dict."""
    out = {}
    for name in names:
        sub, field = PARAM_PATHS[name]
        out[name] = getattr(getattr(scene, sub), field)
    return out


def apply_params(scene: Scene, params: dict) -> Scene:
    """Swap trainable leaves back into the scene pytree."""
    by_sub: dict[str, dict] = {}
    for name, value in params.items():
        sub, field = PARAM_PATHS[name]
        by_sub.setdefault(sub, {})[field] = value
    for sub, fields in by_sub.items():
        scene = dataclasses.replace(
            scene, **{sub: dataclasses.replace(getattr(scene, sub), **fields)}
        )
    return scene


def make_loss(scene: Scene, target, width: int, height: int, *,
              seed: int = 0, tile_rays: int = 1 << 16,
              engine: str = "auto"):
    """-> loss(params, key=None) = mean squared error against ``target``
    (H, W, 3) linear radiance.  Differentiable in every PARAM_PATHS leaf
    present in ``params``.

    ``engine="auto"`` routes through the Pallas megakernel when the scene
    qualifies and a TPU is present — its custom_vjp backward is the fused
    forward-replay+vjp kernel, so the product fit path runs at the same
    speed as bench.py's fwd+bwd headline.  ``key`` (optional (2,) threefry
    key words) overrides ``seed`` and may be traced: the fit loop reseeds
    per step without recompiling.
    """
    target = jnp.asarray(target)

    # Resolve "auto" HERE (scene is concrete): under jax.grad only a
    # differentiable engine qualifies.  The brute kernel differentiates
    # everything in its envelope INCLUDING skymap scenes (miss records ride
    # the custom_vjp; _env_finish's gather cotangents enter the fused
    # backward).  Scenes beyond it take the packet-traversal BVH kernel,
    # whose backward is the record-and-replay path (ops/pallas_megakernel
    # _bvh_cvjp + diff/replay.py).  Only scenes NO kernel admits fall to
    # the XLA reverse path.
    if engine == "auto":
        import jax as _jax

        from ..ops.pallas_megakernel import (UNROLL_MAX_DEPTH, supports,
                                             supports_bvh)

        # TRIANGLE gradients never take the brute kernel on real TPUs: its
        # in-kernel vjp through the triangle-chunk matmuls crashes the
        # Mosaic compiler (SIGABRT) at ANY triangle count — measured on
        # v5e at 16/128/256/512/1024 tris, fused AND two-pass variants
        # (docs/performance.md; r2 only ever ran tri-grads in interpret
        # mode).  DEEP chains never take it either: the grad kernel always
        # unrolls (jax.vjp cannot transpose while_loop) and the depth-50
        # unrolled grad did not finish compiling in 10 min on v5e, while
        # the record+replay fit of the same scene runs at 623K rays/s
        # (scripts/exp_grad_envelope.py, r4).  Triangle and deep fits use
        # the BVH record-and-replay path — hardware-validated at depth 50
        # (monkey: 713K rays/s fwd+bwd) and at 28k tris (cool_cube: 1.93M);
        # shallow sphere-only scenes (the proven fused envelope, bench.py's
        # headline) keep the fused brute kernel.
        from ..render.render import env_is_small

        on_tpu = _jax.devices()[0].platform != "cpu"
        fits = (supports(scene) and len(scene.triangles) == 0
                and scene.settings.max_ray_depth <= UNROLL_MAX_DEPTH)
        if not on_tpu or env_is_small(scene):
            # small env-IS fits keep the XLA MIS estimator (the measured
            # winner below the dense-intersector boundary, render.py)
            engine = "xla"
        elif fits:
            engine = "pallas"
        elif supports_bvh(scene):
            engine = "pallas_bvh"
        else:
            engine = "xla"

    # Fused render->MSE->grad kernel (ops/pallas_megakernel.mse_loss_pallas):
    # one kernel pass per value_and_grad step instead of forward + fused
    # backward — the production fit step and the bench headline both run
    # through here.  Falls back to the generic two-pass path off its gate
    # (skymap, spp not dividing the lane width, beyond-brute scenes).
    if engine == "pallas":
        from ..ops.pallas_megakernel import (_sphere_kinds, _tri_kinds,
                                             mse_loss_pallas,
                                             supports_fused_mse)
        from ..utils import rng as _rng

        if supports_fused_mse(scene) and target.shape == (height, width, 3):
            skinds = _sphere_kinds(scene)
            tkinds = _tri_kinds(scene)
            interpret = jax.devices()[0].platform == "cpu"

            def loss(params: dict, key=None):
                s = apply_params(scene, params)
                k = _rng.base_key(seed) if key is None else jnp.asarray(key)
                return mse_loss_pallas(
                    s, target, width, height,
                    k.astype(jnp.int32), sphere_kinds=skinds,
                    tri_kinds=tkinds, interpret=interpret)

            return loss

    def loss(params: dict, key=None):
        s = apply_params(scene, params)
        img = render_linear(s, width, height, seed=seed, key=key,
                            tile_rays=tile_rays, engine=engine)
        return jnp.mean((img - target) ** 2)

    return loss


def render_and_grad(scene: Scene, target, names, width: int, height: int,
                    *, seed: int = 0, engine: str = "auto"):
    """Convenience: (loss value, grads dict) for the selected params."""
    loss = make_loss(scene, target, width, height, seed=seed, engine=engine)
    params = extract_params(scene, names)
    return jax.value_and_grad(loss)(params)
