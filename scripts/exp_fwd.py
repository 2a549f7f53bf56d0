#!/usr/bin/env python3
"""Quick forward/backward timing matrix on the current device.

    python scripts/exp_fwd.py [--size 512] [--spp 8]

Prints one JSON line per (engine, pass) cell.  Diagnostic only.
"""

import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--spp", type=int, default=8)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--platform", default=None)
    ap.add_argument("--cells", nargs="*",
                    default=["xla_fwd", "pallas_fwd", "xla_fwdbwd"])
    args = ap.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    cache = os.path.join(os.path.dirname(__file__), "..", ".cache", "jax")
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp

    from raytracingrust_tpu.diff.grad import apply_params, extract_params
    from raytracingrust_tpu.models.scene import SceneBuilder
    from raytracingrust_tpu.render.render import render_linear

    b = SceneBuilder.from_file("/root/reference/scenes/benchmark.json")
    b.settings = dataclasses.replace(
        b.settings, samples_per_pixel=args.spp, max_ray_depth=6,
        enable_bvh_tree=False)
    scene = b.build()
    w = h = args.size
    rays = w * h * args.spp
    tile = rays

    def timeit(name, fn, arg):
        # FRESH inputs per iteration: the tunnel deduplicates identical
        # dispatches and reports fake times (docs/performance.md)
        variants = [jax.tree.map(lambda x: x + 1e-7 * i, arg)
                    for i in range(args.iters + 1)]
        out = fn(variants[0])
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for i in range(args.iters):
            out = fn(variants[i + 1])
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / args.iters
        print(json.dumps({"cell": name, "ms": round(dt * 1e3, 2),
                          "Mrays_s": round(rays / dt / 1e6, 1)}), flush=True)

    names = ("albedo", "fuzz", "ir", "emission", "cam_lookfrom", "bg_color_a")
    params = extract_params(scene, names)
    target = jnp.zeros((h, w, 3), jnp.float32)

    if "xla_fwd" in args.cells:
        f = jax.jit(lambda p: render_linear(
            apply_params(scene, p), w, h, seed=0, tile_rays=tile,
            engine="xla"))
        timeit("xla_fwd", f, params)

    if "pallas_fwd" in args.cells:
        f = jax.jit(lambda p: render_linear(
            apply_params(scene, p), w, h, seed=0, tile_rays=tile,
            engine="pallas"))
        timeit("pallas_fwd", f, params)

    if "xla_fwdbwd" in args.cells:
        def loss(p):
            img = render_linear(apply_params(scene, p), w, h, seed=0,
                                tile_rays=tile, engine="xla")
            return jnp.mean((img - target) ** 2)
        f = jax.jit(jax.grad(loss))
        timeit("xla_fwdbwd", f, params)

    if "pallas_fwdbwd" in args.cells:
        def loss_p(p):
            img = render_linear(apply_params(scene, p), w, h, seed=0,
                                tile_rays=tile, engine="pallas")
            return jnp.mean((img - target) ** 2)
        f = jax.jit(jax.grad(loss_p))
        timeit("pallas_fwdbwd", f, params)


if __name__ == "__main__":
    main()
