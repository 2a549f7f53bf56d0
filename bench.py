#!/usr/bin/env python3
"""Standard benchmark: forward+backward rays/s on scenes/benchmark.json.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "rays/s", "vs_baseline": N}

The metric is PRIMARY rays traced per second through a full differentiable
render step (forward radiance + gradient w.r.t. material/emission/camera/
background parameters) — BASELINE.json's "rays/s/chip fwd+bwd on
scenes/benchmark.json".  The baseline divisor is the reference *floor*
recorded in BASELINE_FLOOR.json (the same workload on the JAX-CPU oracle
path of this machine; the Rust reference publishes no numbers — BASELINE.md).
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time


def build_scene(path: str, spp: int, depth: int):
    from raytracingrust_tpu.models.scene import SceneBuilder

    if os.path.exists(path):
        b = SceneBuilder.from_file(path)
    else:  # fall back to the in-repo copy of the benchmark scene
        b = SceneBuilder.from_file(
            os.path.join(os.path.dirname(__file__), "scenes",
                         "benchmark.json")
        )
    b.settings = dataclasses.replace(
        b.settings, samples_per_pixel=spp, max_ray_depth=depth,
        enable_bvh_tree=False,  # 5 spheres: brute-force matmul IS the fast path
    )
    return b.build()


def run_parity(scene):
    """ON-CHIP kernel-vs-XLA correctness bits (VERDICT r4 missing #5).

    All parity/FD tests in tests/ run the kernels in CPU interpret mode;
    this asserts numerical agreement on the REAL device the bench ran on.
    Two criteria, calibrated to what f32 path tracing can actually promise
    (measured r5, docs/performance.md "hardware parity"):

      * DEPTH-1 BITWISE: with a 1-bounce chain no scattered ray exists, so
        camera, intersection, emission and background must agree exactly —
        any hardware miscompile of the RNG, the winner chain, or the
        material table flips this bit.
      * DISTRIBUTION at full depth: deep chains amplify the engines'
        differing-but-equal-magnitude f32 quadratic roundings (both forms
        carry ~|c|^2*eps cancellation on the |c|~100 ground sphere — the
        reference's own f32 math has the same noise, lib/objects.rs:22-51)
        into ~1%-per-bounce discrete path flips, so bitwise comparison is
        meaningless; instead the CROSS-ENGINE error must not exceed the
        CROSS-SEED Monte-Carlo noise of the estimator itself (x1.5): the
        engines sample the same distribution.
      * GRADIENT vs FINITE DIFFERENCES of the kernel's OWN primal, on
        chip: a directional central-difference probe of the FUSED
        render->MSE->grad kernel AND of the packet-BVH record+replay path
        (a small triangle scene).  This is the r2-collapse lesson encoded:
        the custom_vjp backward must match what the hardware kernel's
        forward actually computes — cross-engine grad comparison would
        only re-measure the flip-rate mismatch above (each engine's AD is
        exact for its own primal; the formulations' self-hit flip RATES
        differ systematically, measured r5 at 4-7x the reseed noise on
        background/albedo cotangents).

    Returns {"fwd": bool, "grad": bool}.
    """
    import dataclasses

    import jax
    import jax.numpy as jnp
    import numpy as np

    from raytracingrust_tpu.diff.grad import extract_params, make_loss
    from raytracingrust_tpu.render.render import render_linear
    from raytracingrust_tpu.utils import rng

    w, h = 48, 32
    # depth-1: no scatter chain -> exact agreement required
    s1 = dataclasses.replace(
        scene, settings=dataclasses.replace(scene.settings, max_ray_depth=1))
    p1 = np.asarray(render_linear(s1, w, h, seed=11, engine="pallas"))
    x1 = np.asarray(render_linear(s1, w, h, seed=11, engine="xla"))
    fwd_ok = bool((p1 == x1).all())

    # full depth: cross-engine diff bounded by cross-seed MC noise
    pw = np.asarray(render_linear(scene, w, h, seed=11, engine="pallas"))
    xa = np.asarray(render_linear(scene, w, h, seed=11, engine="xla"))
    xb = np.asarray(render_linear(scene, w, h, seed=12, engine="xla"))
    mad_engine = float(np.abs(pw - xa).mean())
    mad_seed = float(np.abs(xa - xb).mean())
    fwd_ok = fwd_ok and (mad_engine <= 1.5 * mad_seed + 1e-6)

    def fd_ok(loss, params, *, eps=1e-3, rtol=0.05):
        """AD directional derivative == central FD of the same loss
        (fixed key -> smooth in albedo/emission/bg; f32 loss noise ~1e-7
        vs FD numerators ~1e-4)."""
        key = rng.base_key(3)
        gen = np.random.default_rng(0)
        v = {k: jnp.asarray(gen.standard_normal(np.shape(p)), jnp.float32)
             for k, p in params.items()}
        _, g = jax.value_and_grad(loss)(params, key)
        ad = sum(float(jnp.vdot(g[k], v[k])) for k in params)
        plus = {k: params[k] + eps * v[k] for k in params}
        minus = {k: params[k] - eps * v[k] for k in params}
        fd = (float(loss(plus, key)) - float(loss(minus, key))) / (2 * eps)
        return bool(abs(ad - fd) <= rtol * max(abs(fd), 1e-6))

    target = jnp.asarray(xa) * 0.9
    params = extract_params(scene, ("albedo", "emission", "bg_color_a"))
    grad_ok = fd_ok(
        make_loss(scene, target, w, h, seed=0, engine="pallas"), params)

    # record+replay path: a small triangle scene through the packet-BVH
    # kernel's custom_vjp (the engine auto would also pick on TPU)
    ts = _parity_tri_scene()
    t_img = np.asarray(render_linear(ts, 32, 24, seed=5,
                                     engine="pallas_bvh"))
    t_params = extract_params(ts, ("albedo", "bg_color_a"))
    grad_ok = grad_ok and fd_ok(
        make_loss(ts, jnp.asarray(t_img) * 0.9, 32, 24, seed=0,
                  engine="pallas_bvh"), t_params)
    return {"fwd": fwd_ok, "grad": bool(grad_ok)}


def _parity_tri_scene():
    """Tiny self-contained mesh scene for the on-chip record+replay FD
    probe: an 8-triangle fan over a ground sphere, gradient background
    (so bg gradients flow), depth 4."""
    import numpy as np

    from raytracingrust_tpu import (Background, Camera, Lambertian, Mesh,
                                    Metal, RenderSettings, SceneBuilder)

    b = SceneBuilder()
    b.camera = Camera.create((0, 0.4, 1.6), (0, 0.1, -1), (0, 1, 0),
                             60.0, 4 / 3)
    b.settings = RenderSettings(samples_per_pixel=4, max_ray_depth=4)
    b.background = Background.gradient((0.9, 0.9, 1.0), (0.4, 0.55, 0.9))
    ml = b.add_material(Lambertian((0.7, 0.35, 0.2)))
    mm = b.add_material(Metal((0.85, 0.85, 0.9), 0.15))
    mg = b.add_material(Lambertian((0.5, 0.6, 0.3)))
    n = 9
    ang = np.linspace(0, 2 * np.pi, n, dtype=np.float32)
    rim = np.stack([0.7 * np.cos(ang), 0.25 + 0.12 * np.sin(3 * ang),
                    -1.0 + 0.7 * np.sin(ang)], axis=1)
    verts = np.concatenate([[[0, 0.45, -1.0]], rim]).astype(np.float32)
    faces = np.stack([np.zeros(n - 1, np.int32),
                      np.arange(1, n, dtype=np.int32),
                      1 + (np.arange(1, n, dtype=np.int32) % (n - 1))], -1)
    b.add_mesh(Mesh.from_buffers(verts, verts, faces, ml))
    b.add_sphere((0, -100.35, -1), 100.0, mg)
    b.add_sphere((0.55, 0.0, -0.6), 0.18, mm)
    return b.build(with_bvh=True)


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene", default="/root/reference/scenes/benchmark.json")
    ap.add_argument("--width", type=int, default=512)
    ap.add_argument("--height", type=int, default=512)
    ap.add_argument("--spp", type=int, default=8)
    ap.add_argument("--depth", type=int, default=6)
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--warmup", type=int, default=3)
    ap.add_argument("--engine", default="auto",
                    choices=["auto", "pallas", "xla"])
    ap.add_argument("--forward-only", action="store_true")
    ap.add_argument("--no-parity", action="store_true",
                    help="skip the on-chip kernel-vs-XLA parity check")
    ap.add_argument("--platform", default=None,
                    help="force a jax platform (e.g. cpu); note the env var "
                         "JAX_PLATFORMS is ignored by the axon TPU plugin")
    args = ap.parse_args(argv)

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    # Persistent compile cache: first-ever compile of the bench graphs over
    # the TPU tunnel takes minutes; subsequent runs (e.g. the driver's) hit
    # this cache and start in seconds.
    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             ".cache", "jax")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp

    from raytracingrust_tpu.diff.grad import (apply_params, extract_params,
                                              make_loss)
    from raytracingrust_tpu.render.render import render_linear

    scene = build_scene(args.scene, args.spp, args.depth)
    w, h = args.width, args.height
    # one tile for the whole frame: the smallest jaxpr (no lax.map wrapper)
    # -> fastest compile over the tunnel's remote compile helper
    tile_rays = w * h * args.spp

    names = ("albedo", "fuzz", "ir", "emission", "cam_lookfrom", "bg_color_a")
    params = extract_params(scene, names)
    target = jnp.zeros((h, w, 3), jnp.float32)

    # the PRODUCT fit-path loss (diff.grad.make_loss): on TPU this resolves
    # to the fused render->MSE->grad kernel — one kernel launch per
    # value_and_grad step (no separate forward render); off its gate it is
    # the generic custom_vjp / XLA path
    loss_fn = make_loss(scene, target, w, h, seed=0, tile_rays=tile_rays,
                        engine=args.engine)

    if args.forward_only:
        step = jax.jit(
            lambda p: render_linear(apply_params(scene, p), w, h, seed=0,
                                    tile_rays=tile_rays, engine=args.engine)
        )
    else:
        step = jax.jit(jax.grad(loss_fn))

    # FRESH inputs per iteration: the TPU tunnel deduplicates identical
    # dispatches and can report fake times (docs/performance.md)
    n_calls = args.warmup + args.iters
    variants = [jax.tree.map(lambda x: x + 1e-7 * i, params)
                for i in range(n_calls + 1)]

    # compile + warm the dispatch pipeline: the first dispatches after a
    # compile pay ~20 ms of one-time tunnel/queue latency that a real fit
    # loop (hundreds of steps) never sees again — measured r4: 5-iter
    # averages read 150-220 M rays/s for a kernel whose steady state is
    # ~350 M (scripts/profile_fit.py ablation A vs D)
    out = step(variants[0])
    jax.block_until_ready(out)
    for i in range(args.warmup):
        out = step(variants[i + 1])
    jax.block_until_ready(out)

    t0 = time.perf_counter()
    for i in range(args.iters):
        out = step(variants[args.warmup + i + 1])
    jax.block_until_ready(out)
    elapsed = (time.perf_counter() - t0) / args.iters

    primary_rays = w * h * args.spp
    rays_per_s = primary_rays / elapsed

    floor_file = os.path.join(os.path.dirname(__file__),
                              "BASELINE_FLOOR.json")
    floor = None
    if os.path.exists(floor_file):
        with open(floor_file) as f:
            floor = json.load(f).get("rays_per_s_fwd_bwd")

    metric = (
        "primary_rays_per_s_forward" if args.forward_only
        else "primary_rays_per_s_fwd_bwd"
    )
    result = {
        "metric": f"{metric} benchmark.json {w}x{h} spp{args.spp} "
                  f"depth{args.depth}",
        "value": round(rays_per_s, 1),
        "unit": "rays/s",
        "vs_baseline": round(rays_per_s / floor, 2) if floor else None,
    }
    if not args.no_parity:
        # hardware correctness bit riding the artifact of record: the
        # kernels agree with XLA ON THIS DEVICE, not just in interpret mode
        result["parity"] = run_parity(scene)
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
