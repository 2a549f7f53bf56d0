#!/usr/bin/env python3
"""Measure engine choices on the reference bench shapes (VERDICT r3 #1).

For each workload, times render_linear under each candidate engine with
steady-state methodology (warmup dispatches + N-iter average, fresh seeds
per dispatch so the tunnel cannot dedup).  The auto policy in
render.select_engine must match the winners measured here.

    python scripts/exp_dispatch.py [--iters 10] [--only mesh50 ...]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

REF = "/root/reference"


def steady(fn, iters, warmup=2):
    fn(0)  # compile
    for i in range(warmup):
        fn(1 + i)
    t0 = time.perf_counter()
    for i in range(iters):
        fn(100 + i)
    return (time.perf_counter() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--only", nargs="*", default=[])
    args = ap.parse_args()

    import jax

    cache = os.path.join(os.path.dirname(__file__), "..", ".cache", "jax")
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from raytracingrust_tpu import (Camera, Lambertian, Mesh,
                                    RenderSettings, SceneBuilder)
    from raytracingrust_tpu.render.render import render_linear, select_engine

    def monkey(spp, depth):
        b = SceneBuilder()
        b.camera = Camera.create((0, 0, 3), (0, 0, 0), (0, 1, 0), 40.0, 1.0)
        b.settings = RenderSettings(samples_per_pixel=spp,
                                    max_ray_depth=depth)
        m = b.add_material(Lambertian((0.7, 0.7, 0.7)))
        b.add_mesh(Mesh.from_file(os.path.join(REF, "assets", "monkey.obj"),
                                  m))
        return b.build(with_bvh=True)

    def row(name, scene, w, h, engines):
        spp = scene.settings.samples_per_pixel
        auto = select_engine(scene, "auto")
        for eng in engines:
            def go(seed, eng=eng):
                render_linear(scene, w, h, seed=seed,
                              engine=eng).block_until_ready()
            try:
                dt = steady(go, args.iters)
            except Exception as e:
                print(json.dumps({"bench": f"{name}[{eng}]",
                                  "error": f"{type(e).__name__}: {e}"[:200]}),
                      flush=True)
                continue
            print(json.dumps({
                "bench": f"{name}[{eng}]", "ms": round(dt * 1e3, 2),
                "rays_per_s": round(w * h * spp / dt, 1),
                "auto_resolves_to": auto,
            }), flush=True)

    want = lambda k: not args.only or k in args.only

    # the reference mesh bench shape (benches/mesh.rs:9-22)
    if want("mesh50_40"):
        row("monkey_d50_spp10_40x40", monkey(10, 50), 40, 40,
            ("pallas", "pallas_bvh"))
    if want("mesh50_256"):
        row("monkey_d50_spp10_256x256", monkey(10, 50), 256, 256,
            ("pallas", "pallas_bvh"))
    # monkey at default depth (the shallow-triangle dispatch point)
    if want("mesh6_256"):
        row("monkey_d6_spp8_256x256", monkey(8, 6), 256, 256,
            ("pallas", "pallas_bvh"))

    # tiny triangle count + spheres: does the brute kernel win below the
    # one-chunk (128-tri) scale?
    if want("small_tri"):
        b = SceneBuilder()
        b.camera = Camera.create((0, 1, 4), (0, 0.5, 0), (0, 1, 0),
                                 50.0, 1.0)
        b.settings = RenderSettings(samples_per_pixel=8, max_ray_depth=6)
        ml = b.add_material(Lambertian((0.7, 0.6, 0.5)))
        b.add_mesh(Mesh.from_file(os.path.join(REF, "assets", "plane.obj"),
                                  ml))
        for i in range(4):
            b.add_sphere((i - 1.5, 0.5, 0), 0.4, ml)
        row("plane2tri_4sph_d6_spp8_256x256", b.build(with_bvh=True),
            256, 256, ("pallas", "pallas_bvh"))


    # sphere-only DEEP chain (brute loses its unroll above depth 12 —
    # does the generation-scheduled BVH kernel win there?)
    if want("spheres_d50"):
        import dataclasses

        b = SceneBuilder.from_file(os.path.join(REF, "scenes",
                                                "simple.json"))
        b.settings = dataclasses.replace(b.settings, samples_per_pixel=8,
                                         max_ray_depth=50)
        row("simple102sph_d50_spp8_256x256", b.build(with_bvh=True),
            256, 256, ("pallas", "pallas_bvh"))


if __name__ == "__main__":
    main()
