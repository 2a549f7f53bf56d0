#!/usr/bin/env python3
"""Dissect the bench.py fit step: where do the ms go?

Ablations (same workload as bench.py: benchmark.json 512x512 spp8 depth6):
  A. full product step        jax.jit(jax.grad(make_loss(...)))  [bench.py]
  B. kernel-only step         the fused MSE pallas_call with PRE-STAGED
                              device inputs (fparams/tgt/wt/rays baked) —
                              isolates the kernel from per-step XLA prep
  C. full step, value_and_grad (loss + grads, what a real fit loop runs)

Each timed over --iters fresh-seed iterations (the TPU tunnel dedups
identical dispatches, so inputs must vary per call).
"""

from __future__ import annotations

import argparse
import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--width", type=int, default=512)
    ap.add_argument("--height", type=int, default=512)
    ap.add_argument("--spp", type=int, default=8)
    ap.add_argument("--depth", type=int, default=6)
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    cache_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".cache", "jax")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from bench import build_scene
    from raytracingrust_tpu.diff.grad import (apply_params, extract_params,
                                              make_loss)

    scene = build_scene("/root/reference/scenes/benchmark.json",
                        args.spp, args.depth)
    w, h = args.width, args.height
    names = ("albedo", "fuzz", "ir", "emission", "cam_lookfrom", "bg_color_a")
    params = extract_params(scene, names)
    target = jnp.zeros((h, w, 3), jnp.float32)
    n_rays = w * h * args.spp

    def timeit(step, inputs, label):
        out = step(inputs[0])
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for x in inputs[1:]:
            out = step(x)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / (len(inputs) - 1)
        print(f"{label:34s} {dt * 1e3:8.3f} ms/step   "
              f"{n_rays / dt / 1e6:8.1f} M rays/s")
        return dt

    variants = [jax.tree.map(lambda x: x + 1e-7 * i, params)
                for i in range(args.iters + 1)]

    # ---- A: the bench.py step
    loss_fn = make_loss(scene, target, w, h, seed=0,
                        tile_rays=n_rays, engine="auto")
    step_a = jax.jit(jax.grad(loss_fn))
    timeit(step_a, variants, "A full jit(grad(loss))")

    # ---- C: value_and_grad (the real fit loop step)
    step_c = jax.jit(jax.value_and_grad(loss_fn))
    timeit(step_c, variants, "C full jit(value_and_grad)")

    # ---- B: fused kernel with pre-staged inputs
    from raytracingrust_tpu.ops.pallas_megakernel import (
        _mse_cvjp, _pack_fparams, _prep_rays, _sphere_kinds)
    from raytracingrust_tpu.utils import rng

    spp = scene.settings.samples_per_pixel
    pixel_ids = jnp.arange(w * h, dtype=jnp.int32)
    ray_ids, px, py, rows, n_r = _prep_rays(pixel_ids, spp, w)
    t3 = jnp.zeros((w * h, 3), jnp.float32)
    w_real = jnp.full((n_r,), 1.0 / (3.0 * w * h * spp), jnp.float32)
    pad = rows * 256 - n_r

    def blocks(v):
        if pad:
            v = jnp.concatenate([v, jnp.zeros((pad,), jnp.float32)])
        return v.reshape(rows, 256)

    def rep(col):
        return jnp.broadcast_to(col[:, None], (w * h, spp)).reshape(-1)

    tgt = tuple(blocks(rep(t3[:, c])) for c in range(3))
    wt = blocks(w_real)
    iparams = rng.base_key(0).astype(jnp.int32)
    skinds = _sphere_kinds(scene)
    mse = _mse_cvjp(len(scene.spheres), args.depth, skinds,
                    scene.background.kind, False, rows, False, spp,
                    float(scene.settings.clamp_indirect))

    staged = [jax.device_put(x) for x in (*tgt, wt, iparams, ray_ids,
                                          px, py)]
    jax.block_until_ready(staged)

    def kernel_step(p):
        s = apply_params(scene, p)
        fp = _pack_fparams(s, w, h)
        return jax.grad(
            lambda fpx: mse(fpx, *staged))(fp)

    step_b = jax.jit(kernel_step)
    timeit(step_b, variants, "B pre-staged fused kernel+pack")

    # ---- D: fparams fully baked — the raw kernel alone
    fp0 = jax.device_put(_pack_fparams(scene, w, h))
    fp_variants = [fp0 + 1e-7 * i for i in range(args.iters + 1)]
    jax.block_until_ready(fp_variants)

    step_d = jax.jit(lambda fp: jax.grad(
        lambda fpx: mse(fpx, *staged))(fp))
    timeit(step_d, fp_variants, "D raw fused kernel (fp input)")

    return 0


if __name__ == "__main__":
    sys.exit(main())
