#!/usr/bin/env python3
"""Dissect a record+replay fit step (VERDICT r4 weak #1: BVH-class fits
run ~10x below their own forward — where do the ms go?).

Ablations on a BVH-class workload (default: monkey.obj depth 50, the
reference mesh-bench shape; --scene simple for simple.json d50):

  A. forward render            pixel_radiance_pallas_bvh (no records)
  B. record pass               the vjp FORWARD half: record kernel + finish
  C. full value_and_grad       record pass + XLA shading replay + vjp
  D. replay forward            diff/replay.replay_radiance on synthetic
                               records (same op graph as the real bwd)
  E. replay fwd+vjp            jax.vjp of D — the cost the bwd rule pays

C - B ~= E is the replay bill.  D vs E splits primal recompute from
residual/cotangent traffic.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(fn, variants, iters=5):
    import jax
    out = fn(variants[0])
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for i in range(iters):
        out = fn(variants[1 + i % (len(variants) - 1)])
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene", default="monkey", choices=["monkey", "simple"])
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--profile", help="dump a jax.profiler trace here")
    args = ap.parse_args()

    import dataclasses

    import jax
    import jax.numpy as jnp
    import numpy as np

    cache_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".cache", "jax")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from raytracingrust_tpu import Lambertian, Mesh, SceneBuilder
    from raytracingrust_tpu.diff.grad import extract_params, make_loss
    from raytracingrust_tpu.render.render import render_linear
    from raytracingrust_tpu.utils import rng

    w = h = args.size
    if args.scene == "monkey":
        spp, depth = 10, 50
        b = SceneBuilder()
        m = b.add_material(Lambertian((0.6, 0.5, 0.4)))
        b.add_mesh(Mesh.from_file("/root/reference/assets/monkey.obj", m))
        b.camera = __import__(
            "raytracingrust_tpu").Camera.create(
            (0, 0.2, 2.5), (0, 0, 0), (0, 1, 0), 60.0, 1.0)
        b.settings = dataclasses.replace(
            b.settings, samples_per_pixel=spp, max_ray_depth=depth)
        scene = b.build(with_bvh=True)
    else:
        spp, depth = 8, 50
        b = SceneBuilder.from_file("/root/reference/scenes/simple.json")
        b.settings = dataclasses.replace(
            b.settings, samples_per_pixel=spp, max_ray_depth=depth)
        scene = b.build(with_bvh=True)

    n_rays = w * h * spp
    keys = [rng.base_key(i) for i in range(8)]
    print(f"workload: {args.scene} {w}x{h} spp{spp} depth{depth} "
          f"({n_rays/1e6:.2f}M rays)", flush=True)

    # A: forward
    fwd = jax.jit(lambda k: render_linear(scene, w, h, key=k,
                                          engine="pallas_bvh"))
    tA = timeit(fwd, keys, args.iters)
    print(f"A fwd render          {tA*1e3:8.1f} ms  "
          f"{n_rays/tA/1e6:8.2f} M rays/s", flush=True)

    # loss / step
    target = jnp.zeros((h, w, 3), jnp.float32)
    params = extract_params(scene, ("albedo",))
    loss = make_loss(scene, target, w, h, seed=0, engine="pallas_bvh")
    pvar = [jax.tree.map(lambda x: x + 1e-7 * i, params) for i in range(8)]

    # B: record pass (vjp forward half only)
    @jax.jit
    def rec_only(p, k):
        out, _ = jax.vjp(lambda pp: loss(pp, k), p)
        return out
    tB = timeit(lambda p: rec_only(p, keys[0]), pvar, args.iters)
    print(f"B record pass         {tB*1e3:8.1f} ms  "
          f"{n_rays/tB/1e6:8.2f} M rays/s", flush=True)

    # C: full step
    step = jax.jit(jax.value_and_grad(loss))
    tC = timeit(lambda p: step(p, keys[0]), pvar, args.iters)
    print(f"C value_and_grad      {tC*1e3:8.1f} ms  "
          f"{n_rays/tC/1e6:8.2f} M rays/s", flush=True)

    # D/E: replay on synthetic records (same op graph as the real bwd)
    from raytracingrust_tpu.diff.replay import replay_radiance

    cb = scene.cbvh
    lf = cb.leaf_size
    n_slots = (cb.n_sph_chunks + cb.n_vol_chunks + cb.n_tri_chunks) * lf
    gen = np.random.default_rng(0)
    rec = gen.integers(-1, n_slots, size=(n_rays, depth), dtype=np.int32)
    # sprinkle the branch bits like the kernel would
    bits = gen.integers(0, 8, size=(n_rays, depth), dtype=np.int32) << 27
    rec = np.where(rec >= 0, rec | bits, -1)
    rec = jnp.asarray(rec)
    ray_ids = jnp.arange(n_rays, dtype=jnp.int32)
    px = (jnp.arange(n_rays, dtype=jnp.int32) // spp % w).astype(jnp.float32)
    py = (jnp.arange(n_rays, dtype=jnp.int32) // spp // w).astype(jnp.float32)

    from raytracingrust_tpu.diff.grad import apply_params

    @jax.jit
    def replay_fwd(p, k):
        s = apply_params(scene, p)
        return replay_radiance(s, rec, k, ray_ids, px, py, w, h)
    tD = timeit(lambda p: replay_fwd(p, keys[0]), pvar, args.iters)
    print(f"D replay forward      {tD*1e3:8.1f} ms  "
          f"{n_rays/tD/1e6:8.2f} M rays/s", flush=True)

    @jax.jit
    def replay_grad(p, k):
        def f(pp):
            s = apply_params(scene, pp)
            return jnp.mean(replay_radiance(s, rec, k, ray_ids, px, py,
                                            w, h))
        return jax.grad(f)(p)
    tE = timeit(lambda p: replay_grad(p, keys[0]), pvar, args.iters)
    print(f"E replay fwd+vjp      {tE*1e3:8.1f} ms  "
          f"{n_rays/tE/1e6:8.2f} M rays/s", flush=True)

    print(f"\nsplit: record {tB*1e3:.1f} ms | replay bill (C-B) "
          f"{(tC-tB)*1e3:.1f} ms | synthetic replay vjp {tE*1e3:.1f} ms",
          flush=True)

    if args.profile:
        with jax.profiler.trace(args.profile):
            for i in range(3):
                out = step(pvar[i], keys[0])
            jax.block_until_ready(out)
        print("trace ->", args.profile, flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
