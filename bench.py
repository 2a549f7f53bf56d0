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
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
