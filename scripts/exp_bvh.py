#!/usr/bin/env python3
"""BVH-path render timings per engine (incremental output, TPU).

Usage: python scripts/exp_bvh.py [--scene bvh_stress|grid8k|grid30k|house]
                                 [--engine pallas_bvh|xla] [--size N]

Prints one JSON line per measurement (flushed immediately so partial runs
still yield data).  rays_per_s counts primary rays (w*h*spp / s), the same
normalization as scripts/bench_suite.py.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

REF = "/root/reference"


def build_scene(name):
    import numpy as np

    from raytracingrust_tpu import (Camera, Lambertian, Mesh, RenderSettings,
                                    SceneBuilder)
    from raytracingrust_tpu.models.scene import load_scene

    if name == "bvh_stress":
        return load_scene(os.path.join(
            os.path.dirname(__file__), "..", "scenes", "bvh_stress.json"))
    if name in ("grid8k", "grid30k"):
        b = SceneBuilder()
        m = b.add_material(Lambertian((0.5, 0.5, 0.5)))
        dims = (20, 20, 20) if name == "grid8k" else (10, 55, 55)
        for i in range(dims[0]):
            for j in range(dims[1]):
                for k in range(dims[2]):
                    b.add_sphere((i * 1.0, j * 1.0, k * 1.0), 0.3, m)
        c = tuple((d - 1) / 2 for d in dims)
        eye = tuple(ci + 2.2 * max(dims) * v
                    for ci, v in zip(c, (0.7, 0.6, 0.8)))
        b.camera = Camera.create(eye, c, (0, 1, 0), 45.0, 1.0)
        b.settings = RenderSettings(samples_per_pixel=5, max_ray_depth=6)
        return b.build(with_bvh=True)
    if name == "house":
        b = SceneBuilder()
        b.camera = Camera.create((8, 6, 10), (0, 1, 0), (0, 1, 0), 45.0, 1.0)
        b.settings = RenderSettings(samples_per_pixel=5, max_ray_depth=6)
        m = b.add_material(Lambertian((0.7, 0.6, 0.5)))
        b.add_mesh(Mesh.from_file(os.path.join(REF, "assets", "house.obj"),
                                  m))
        return b.build(with_bvh=True)
    raise SystemExit(f"unknown scene {name}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene", nargs="*",
                    default=["bvh_stress", "grid8k", "house"])
    ap.add_argument("--engine", nargs="*", default=["pallas_bvh", "xla"])
    ap.add_argument("--size", type=int, default=None)
    ap.add_argument("--iters", type=int, default=2)
    args = ap.parse_args()

    import jax

    cache = os.path.join(os.path.dirname(__file__), "..", ".cache", "jax")
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)

    from raytracingrust_tpu.render.render import render_linear

    for sname in args.scene:
        scene = build_scene(sname)
        spp = scene.settings.samples_per_pixel
        for eng in args.engine:
            # the XLA gather path is slow at scale — smaller default frame
            size = args.size or (256 if eng == "pallas_bvh" else 128)
            seeds = iter(range(1, 1000))

            def go():
                render_linear(scene, size, size, seed=next(seeds),
                              engine=eng).block_until_ready()

            t0 = time.perf_counter()
            go()
            compile_s = time.perf_counter() - t0
            best = float("inf")
            for _ in range(args.iters):
                t0 = time.perf_counter()
                go()
                best = min(best, time.perf_counter() - t0)
            print(json.dumps({
                "scene": sname, "engine": eng, "size": size, "spp": spp,
                "seconds": round(best, 4),
                "compile_s": round(compile_s, 1),
                "rays_per_s": round(size * size * spp / best, 1),
            }), flush=True)


if __name__ == "__main__":
    main()
