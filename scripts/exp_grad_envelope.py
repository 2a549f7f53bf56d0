#!/usr/bin/env python3
"""Hardware-validate the GRADIENT envelope at the reference's extremes
(VERDICT r3 #7): compile + run value_and_grad fits at depth 50 and at
cool_cube scale on the real chip, and measure which engine wins deep
sphere-only fits (informs make_loss's auto routing).

    python scripts/exp_grad_envelope.py --only monkey50 cool_cube ...
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

REF = "/root/reference"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--only", nargs="*", default=[])
    ap.add_argument("--size", type=int, default=256)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    cache = os.path.join(os.path.dirname(__file__), "..", ".cache", "jax")
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import dataclasses

    from raytracingrust_tpu import (Camera, Lambertian, Mesh,
                                    RenderSettings, SceneBuilder)
    from raytracingrust_tpu.diff.grad import extract_params, make_loss
    from raytracingrust_tpu.utils import rng

    def fit_row(name, scene, w, h, engine, names=("albedo", "emission")):
        spp = scene.settings.samples_per_pixel
        params = extract_params(scene, names)
        target = jnp.zeros((h, w, 3), jnp.float32)
        loss_fn = make_loss(scene, target, w, h, seed=0,
                            tile_rays=w * h * spp, engine=engine)
        step = jax.jit(jax.value_and_grad(loss_fn))
        keys = [rng.base_key(s) for s in range(args.iters + 3)]
        try:
            t0 = time.perf_counter()
            out = step(params, keys[0])
            jax.block_until_ready(out)
            compile_s = time.perf_counter() - t0
            for k in keys[1:3]:
                out = step(params, k)
            jax.block_until_ready(out)
            t0 = time.perf_counter()
            for k in keys[3:]:
                out = step(params, k)
            jax.block_until_ready(out)
            dt = (time.perf_counter() - t0) / args.iters
        except Exception as e:
            print(json.dumps({"bench": name, "engine": engine,
                              "error": f"{type(e).__name__}: {e}"[:300]}),
                  flush=True)
            return
        loss, grads = out
        gsum = sum(float(jnp.abs(g).sum()) for g in
                   jax.tree.leaves(grads))
        print(json.dumps({
            "bench": name, "engine": engine,
            "ms_per_step": round(dt * 1e3, 2),
            "rays_per_s_fwd_bwd": round(w * h * spp / dt, 1),
            "compile_s": round(compile_s, 1),
            "loss": round(float(loss), 6), "grad_abs_sum": round(gsum, 6),
        }), flush=True)

    want = lambda k: not args.only or k in args.only
    s = args.size

    def monkey(spp, depth):
        b = SceneBuilder()
        b.camera = Camera.create((0, 0, 3), (0, 0, 0), (0, 1, 0), 40.0, 1.0)
        b.settings = RenderSettings(samples_per_pixel=spp,
                                    max_ray_depth=depth)
        m = b.add_material(Lambertian((0.7, 0.7, 0.7)))
        b.add_mesh(Mesh.from_file(os.path.join(REF, "assets", "monkey.obj"),
                                  m))
        return b.build(with_bvh=True)

    # the reference mesh-bench shape, as a FIT (record+replay at depth 50)
    if want("monkey50"):
        fit_row(f"fit_monkey_d50_spp10_{s}x{s}", monkey(10, 50), s, s,
                "auto")

    # the biggest shipped OBJ as a fit
    if want("cool_cube"):
        b = SceneBuilder()
        b.camera = Camera.create((3, 2.5, 4), (0, 0.5, 0), (0, 1, 0),
                                 45.0, 1.0)
        b.settings = RenderSettings(samples_per_pixel=5, max_ray_depth=6)
        m = b.add_material(Lambertian((0.6, 0.65, 0.7)))
        b.add_mesh(Mesh.from_file(
            os.path.join(REF, "assets", "cool_cube.obj"), m))
        fit_row(f"fit_cool_cube_d6_spp5_{s}x{s}", b.build(with_bvh=True),
                s, s, "auto")

    # deep sphere-only fit: brute (unrolled d50 grad — does it even
    # compile?) vs bvh record+replay
    if want("spheres50") or want("spheres50_brute") \
            or want("spheres50_bvh"):
        b = SceneBuilder.from_file(os.path.join(REF, "scenes",
                                                "simple.json"))
        b.settings = dataclasses.replace(b.settings, samples_per_pixel=8,
                                         max_ray_depth=50)
        scene = b.build(with_bvh=True)
        engines = {"spheres50": ("pallas", "pallas_bvh"),
                   "spheres50_brute": ("pallas",),
                   "spheres50_bvh": ("pallas_bvh",)}
        ran = set()
        for key, engs in engines.items():
            if not want(key):
                continue
            for eng in engs:
                if eng in ran:
                    continue
                ran.add(eng)
                fit_row(f"fit_simple102_d50_spp8_{s}x{s}", scene, s, s,
                        eng)


if __name__ == "__main__":
    main()
