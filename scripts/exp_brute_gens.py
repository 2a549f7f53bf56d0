#!/usr/bin/env python3
"""VERDICT r4 weak #2 / next-round #7: ONE measured attempt at the brute
forward kernel's dead-lane waste (31% of the VPU roof at depth 6).

The docs argued from estimates that generation scheduling cannot beat the
unrolled chain on the brute kernel's reachable shapes; this measures it.
A generation-scheduled BRUTE forward (the _radiance_math gens path with
bvh=None — the same scheduler the packet kernel uses) runs benchmark.json
512x512 spp8 depth6 against the product unrolled forward.

    python scripts/exp_brute_gens.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main() -> int:
    import jax
    import jax.numpy as jnp

    cache = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".cache", "jax")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from bench import build_scene
    from raytracingrust_tpu.ops import pallas_megakernel as PK
    from raytracingrust_tpu.render.render import render_linear
    from raytracingrust_tpu.utils import rng

    scene = build_scene("/root/reference/scenes/benchmark.json", 8, 6)
    w = h = 512
    spp = 8
    n_rays = w * h * spp
    keys = [rng.base_key(i) for i in range(6)]

    def timeit(fn, iters=8):
        out = fn(keys[0])
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for i in range(iters):
            out = fn(keys[1 + i % 4])
        jax.block_until_ready(out)
        return (time.perf_counter() - t0) / iters

    # product unrolled forward (the 430-468M headline path)
    t_prod = timeit(lambda k: render_linear(scene, w, h, key=k,
                                            engine="pallas"))
    print(f"unrolled product fwd: {t_prod*1e3:6.1f} ms "
          f"{n_rays/t_prod/1e6:7.1f} M rays/s", flush=True)

    # generation-scheduled brute forward (experimental wiring)
    skinds = PK._sphere_kinds(scene)
    n_spheres = len(scene.spheres)
    bg_kind = scene.background.kind

    def run_gens(gens):
        pixel_ids = jnp.arange(w * h, dtype=jnp.int32)
        ray_ids, px, py, rows, nr = PK._prep_rays(pixel_ids, spp, w,
                                                  block_mult=gens)
        grid = rows // (PK.BLOCK_ROWS * gens)
        block = pl.BlockSpec((PK.BLOCK_ROWS * gens, PK.BLOCK_COLS),
                             lambda i, *_: (i, 0),
                             memory_space=pltpu.VMEM)
        out_sh = jax.ShapeDtypeStruct((rows, PK.BLOCK_COLS), jnp.float32)

        def kernel(iparams, fparams, ray_id_ref, px_ref, py_ref,
                   o_r, o_g, o_b):
            seed_hi = iparams[0].astype(jnp.uint32)
            seed_lo = iparams[1].astype(jnp.uint32)
            ray_id = ray_id_ref[...]
            ray_u32 = ray_id.astype(jnp.uint32)
            k0 = jnp.full(ray_id.shape, 0, jnp.uint32) + seed_hi
            k1 = jnp.full(ray_id.shape, 0, jnp.uint32) + seed_lo
            vals = PK._radiance_math(
                lambda i: fparams[i], k0, k1, ray_u32, px_ref[...],
                py_ref[...], n_spheres=n_spheres, max_depth=6,
                sphere_kinds=skinds, bg_kind=bg_kind, clay=False,
                unrolled=False, gens=gens)
            for ref, val in zip((o_r, o_g, o_b), vals):
                ref[...] = val

        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2, grid=(grid,),
            in_specs=[block] * 3, out_specs=[block] * 3)

        @jax.jit
        def go(key):
            fparams = PK._pack_fparams(scene, w, h)
            outs = pl.pallas_call(
                kernel, grid_spec=grid_spec,
                out_shape=[out_sh] * 3,
            )(jnp.asarray(key).astype(jnp.int32), fparams,
              ray_ids, px, py)
            return outs[0]

        return go

    for gens in (2, 4, 8):
        try:
            go = run_gens(gens)
            t = timeit(go)
            print(f"while_loop + gens={gens}: {t*1e3:6.1f} ms "
                  f"{n_rays/t/1e6:7.1f} M rays/s", flush=True)
        except Exception as e:  # commit whatever the attempt produced
            print(f"gens={gens}: FAILED: {type(e).__name__}: "
                  f"{str(e)[:200]}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
