#!/usr/bin/env python3
"""Full benchmark suite — one JSON line per benchmark.

Mirrors the reference's four criterion benches (SURVEY.md 2.5) plus this
framework's own headline metrics:

  simple_render    end-to-end render of scenes/simple.json at 100x100
                   (benches/simple_render_bench.rs:7-12)
  bvh_build_8k     BVH construction, 20^3-sphere grid
                   (benches/bvh_tree_stress.rs:16-30)
  bvh_build_30k    BVH construction, 10x55x55 grid
                   (benches/quad_tree_construction.rs:14-27)
  mesh_render      monkey.obj, 40x40, spp 10, depth 50
                   (benches/mesh.rs:9-22)
  fwd_bwd          differentiable render step on benchmark.json (bench.py)
  bvh_stress_render   scenes/bvh_stress.json (1,189 spheres) render,
                      per engine (pallas_bvh packet traversal vs xla)
  grid8k_render       8,000-sphere grid render (the reference's BVH stress
                      GEOMETRY, actually rendered), per engine
  mesh_render_house   house.obj (9,153 tris — above the brute kernel's
                      8,192 limit), per engine

    python scripts/bench_suite.py [--platform cpu] [--skip mesh_render ...]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

REF = "/root/reference"


def emit(name, seconds, extra=None):
    rec = {"bench": name, "seconds": round(seconds, 4)}
    if extra:
        rec.update(extra)
    print(json.dumps(rec), flush=True)


def time_steady(fn, iters=3, warmup=2):
    """Steady-state average: compile + ``warmup`` dispatches first (the
    first dispatches after a compile pay ~20 ms of one-time tunnel/queue
    latency — docs/performance.md round-4 reconciliation), then the mean
    of ``iters`` timed calls.  ``fn(i)`` must vary its dispatch with ``i``
    (e.g. the seed) or the tunnel dedups and reports fake times."""
    fn(0)  # warm-up / compile
    for i in range(warmup):
        fn(1 + i)
    t0 = time.perf_counter()
    for i in range(iters):
        fn(100 + i)
    return (time.perf_counter() - t0) / iters


def sphere_grid(nx, ny, nz):
    import numpy as np

    from raytracingrust_tpu import Lambertian, SceneBuilder

    b = SceneBuilder()
    m = b.add_material(Lambertian((0.5, 0.5, 0.5)))
    for i in range(nx):
        for j in range(ny):
            for k in range(nz):
                b.add_sphere((i * 1.0, j * 1.0, k * 1.0), 0.3, m)
    return b


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--platform", default=None)
    ap.add_argument("--skip", nargs="*", default=[])
    ap.add_argument("--iters", type=int, default=3)
    args = ap.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    cache = os.path.join(os.path.dirname(__file__), "..", ".cache", "jax")
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)

    import dataclasses

    import numpy as np

    from raytracingrust_tpu import Mesh, RenderSettings, SceneBuilder
    from raytracingrust_tpu.ops.bvh import build_bvh, primitive_bounds
    from raytracingrust_tpu.render.render import render_linear

    # --- simple_render: scenes/simple.json, 100x100 (reference settings:
    # spp 5, depth 6, BVH on)
    if "simple_render" not in args.skip:
        b = SceneBuilder.from_file(os.path.join(REF, "scenes", "simple.json"))
        scene = b.build()
        dt = time_steady(
            lambda i: render_linear(scene, 100, 100,
                                    seed=i).block_until_ready(),
            args.iters,
        )
        emit("simple_render_100x100", dt, {
            "rays_per_s": round(100 * 100 * 5 / dt, 1)})

    # --- BVH builds (host side; native C++ when available)
    if "bvh_build_8k" not in args.skip:
        spheres = sphere_grid(20, 20, 20).build(with_bvh=False).spheres
        tris = SceneBuilder().build(with_bvh=False).triangles
        dt = time_steady(lambda i: build_bvh(spheres, tris), args.iters)
        emit("bvh_build_8000", dt)

    if "bvh_build_30k" not in args.skip:
        spheres = sphere_grid(10, 55, 55).build(with_bvh=False).spheres
        tris = SceneBuilder().build(with_bvh=False).triangles
        dt = time_steady(lambda i: build_bvh(spheres, tris), args.iters)
        emit("bvh_build_30250", dt)

    # --- mesh render: monkey.obj 40x40 spp10 depth50 (benches/mesh.rs)
    if "mesh_render" not in args.skip:
        from raytracingrust_tpu import Camera, Lambertian

        b = SceneBuilder()
        b.camera = Camera.create((0, 0, 3), (0, 0, 0), (0, 1, 0), 40.0, 1.0)
        b.settings = RenderSettings(samples_per_pixel=10, max_ray_depth=50)
        m = b.add_material(Lambertian((0.7, 0.7, 0.7)))
        b.add_mesh(Mesh.from_file(
            os.path.join(REF, "assets", "monkey.obj"), m))
        scene = b.build(with_bvh=True)
        dt = time_steady(
            lambda i: render_linear(scene, 40, 40,
                                    seed=i).block_until_ready(),
            args.iters,
        )
        emit("mesh_render_monkey_40x40", dt, {
            "rays_per_s": round(40 * 40 * 10 / dt, 1)})

    # --- BVH-path renders, per engine (VERDICT r1 item 7: publish render
    # throughput for scenes the brute-force kernel cannot take)
    def engine_rows(name, scene, w, h,
                    engines=("auto", "pallas_bvh", "xla")):
        spp = scene.settings.samples_per_pixel
        for eng in engines:
            def go(i, eng=eng):
                # vary the seed so the axon tunnel cannot dedup dispatches
                render_linear(scene, w, h, seed=i,
                              engine=eng).block_until_ready()
            try:
                dt = time_steady(go, args.iters)
            except Exception as e:  # pragma: no cover - engine gate
                emit(f"{name}[{eng}]", float("nan"),
                     {"error": type(e).__name__})
                continue
            emit(f"{name}[{eng}]", dt, {
                "rays_per_s": round(w * h * spp / dt, 1)})

    if "bvh_stress_render" not in args.skip:
        from raytracingrust_tpu.models.scene import load_scene

        scene = load_scene(os.path.join(
            os.path.dirname(__file__), "..", "scenes", "bvh_stress.json"))
        engine_rows("bvh_stress_render_256", scene, 256, 256)

    if "grid8k_render" not in args.skip:
        from raytracingrust_tpu import Camera

        b = sphere_grid(20, 20, 20)
        b.camera = Camera.create((35, 30, 38), (9.5, 9.5, 9.5), (0, 1, 0),
                                 45.0, 1.0)
        b.settings = RenderSettings(samples_per_pixel=5, max_ray_depth=6)
        engine_rows("grid8k_render_256", b.build(with_bvh=True), 256, 256)

    if "mesh_render_house" not in args.skip:
        from raytracingrust_tpu import Camera, Lambertian

        b = SceneBuilder()
        b.camera = Camera.create((8, 6, 10), (0, 1, 0), (0, 1, 0), 45.0, 1.0)
        b.settings = RenderSettings(samples_per_pixel=5, max_ray_depth=6)
        m = b.add_material(Lambertian((0.7, 0.6, 0.5)))
        b.add_mesh(Mesh.from_file(
            os.path.join(REF, "assets", "house.obj"), m))
        engine_rows("mesh_render_house_256", b.build(with_bvh=True),
                    256, 256)

    if "mesh_render_cool_cube" not in args.skip:
        from raytracingrust_tpu import Camera, Lambertian

        # cool_cube: ~28k triangles — the biggest shipped OBJ, inside the
        # packet kernel's MAX_BVH_TRIS envelope (VERDICT r2 missing #6)
        b = SceneBuilder()
        b.camera = Camera.create((3, 2.5, 4), (0, 0.5, 0), (0, 1, 0),
                                 45.0, 1.0)
        b.settings = RenderSettings(samples_per_pixel=5, max_ray_depth=6)
        m = b.add_material(Lambertian((0.6, 0.65, 0.7)))
        b.add_mesh(Mesh.from_file(
            os.path.join(REF, "assets", "cool_cube.obj"), m))
        engine_rows("mesh_render_cool_cube_256", b.build(with_bvh=True),
                    256, 256)

    if "env_is_render" not in args.skip:
        from raytracingrust_tpu import Background, Camera, Metal

        # HDRI importance sampling past the XLA dense-intersector cliff
        # (r4 hybrid; docs/performance.md "HDRI importance sampling")
        img = np.full((16, 32, 3), 0.05, np.float32)
        img[2:4, 5:8] = 25.0
        b = SceneBuilder()
        b.camera = Camera.create((8, 7, 10), (0, 0, 0), (0, 1, 0),
                                 50.0, 1.0)
        b.settings = RenderSettings(samples_per_pixel=8, max_ray_depth=4,
                                    env_importance_sampling=True)
        from raytracingrust_tpu import Lambertian
        lam = b.add_material(Lambertian((0.7, 0.6, 0.5)))
        met = b.add_material(Metal((0.9, 0.9, 0.9), 0.1))
        rs = np.random.RandomState(0)
        for i in range(8):
            for j in range(6):
                for k in range(8):
                    b.add_sphere(((i - 3.5) * 1.1, (j - 2.5) * 1.1,
                                  (k - 3.5) * 1.1), 0.4,
                                 (lam, met)[rs.randint(2)])
        b.background = Background.skymap_from_array(img)
        engine_rows("env_is_384sph_128", b.build(with_bvh=True), 128, 128)

    # --- headline fwd+bwd (delegates to bench.py logic)
    if "fwd_bwd" not in args.skip:
        import bench as bench_mod
        bench_mod.main(
            (["--platform", args.platform] if args.platform else [])
            + ["--iters", str(args.iters)]
        )


if __name__ == "__main__":
    main()
