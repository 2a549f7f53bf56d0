"""Pallas wavefront megakernel — the TPU fast path for sphere scenes.

The XLA integrator (render/integrator.py) is correct for everything but pays
an HBM round-trip of the whole wavefront state per bounce (profiling: ~90%
of runtime is the scan while-loop, dominated by carry copies).  This kernel
keeps a block of 2048 rays RESIDENT IN VMEM for the entire bounce chain
(SURVEY.md section 7 stage 3):

  * grid over ray blocks; per block all state ((8, 256) f32 registers:
    origin/direction/throughput/radiance components, alive mask) never
    leaves the chip;
  * the sphere loop is UNROLLED over the scene — scene constants live in
    scalar-prefetch SMEM, so for the reference's benchmark scenes this is
    the speed-of-light formulation (no gathers, no BVH, no HBM);
  * counter-based threefry2x32 (cipher + counter layout shared with
    utils/rng.py): the kernel consumes byte-identical uniform draws to the
    XLA integrator, so images agree except for ulp-level arithmetic-order
    effects; the bounce chain is a while_loop with an all-dead early-out;
  * material lobes compile only for kinds the scene uses; per-sphere
    material KINDS are static (geometry edits recompile) while all material
    VALUES (albedo/fuzz/ir/emission, camera, background) stay runtime inputs
    — inverse-rendering forward passes never recompile.

Scope (static ``supports`` gate; everything else falls back to XLA):
spheres only, no volumes/mixes/isotropic, uniform or gradient background,
Full/Clay mode.  Forward only — gradients use the XLA path.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..models import backgrounds as B
from ..models import materials as M
from ..models.scene import MODE_CLAY, MODE_FULL, Scene
from ..utils.rng import CIPHER_BLOCK, bits_to_uniform, threefry2x32
from ..utils.types import T_MIN

BLOCK_ROWS = 8
BLOCK_COLS = 256
BLOCK = BLOCK_ROWS * BLOCK_COLS  # rays per grid step

# float scalar-param layout
_CAM = 0            # origin(3) horizontal(3) vertical(3) lower_left(3)
_BG = 12            # color_a(3) color_b(3)
_INV_W = 18         # 1 / (width - 1)
_INV_H = 19         # 1 / (height - 1)
_SPHERES = 20       # per sphere: cx cy cz r  al_r al_g al_b  fuzz ir
_SPHERE_STRIDE = 12  # em_r em_g em_b

MAX_UNROLLED_SPHERES = 128  # covers scenes/simple.json (102 spheres)


def supports(scene: Scene) -> bool:
    """Static capability check for this kernel."""
    return (
        len(scene.triangles) == 0
        and 0 < len(scene.spheres) <= MAX_UNROLLED_SPHERES
        and scene.spheres.num_volumes == 0
        and not scene.materials.has_mix
        and M.ISOTROPIC not in scene.materials.kinds_present
        and scene.background.kind in (B.UNIFORM, B.GRADIENT)
        and scene.settings.mode in (MODE_FULL, MODE_CLAY)
    )


# -------------------------------------------------------- counter-based RNG
#
# The cipher + counter layout live in utils/rng.py and are SHARED with the
# XLA integrator: uniform column c of stream s for ray r is word (c % 2) of
# threefry2x32(seed, x0=r, x1=s*CIPHER_BLOCK + c//2) in both engines, so the
# two consume byte-identical randomness (tests/test_pallas.py).

def _stream_uniforms(k0, k1, ray_id_u32, stream, n: int):
    """First n uniform columns of (ray, stream) — ceil(n/2) ciphers.
    ``stream`` may be a traced scalar (the while-loop bounce index)."""
    base = jnp.broadcast_to(
        jnp.asarray(stream, jnp.uint32) * np.uint32(CIPHER_BLOCK),
        ray_id_u32.shape,
    )
    cols = []
    for j in range(-(-n // 2)):
        a0, a1 = threefry2x32(k0, k1, ray_id_u32, base + np.uint32(j))
        cols.append(bits_to_uniform(a0))
        cols.append(bits_to_uniform(a1))
    return cols[:n]


# ------------------------------------------------------------------ kernel

def _dot3(ax, ay, az, bx, by, bz):
    return ax * bx + ay * by + az * bz


def _radiance_math(f, k0, k1, ray_u32, px, py, *, n_spheres, max_depth,
                   sphere_kinds, bg_kind, clay, unrolled):
    """The megakernel's radiance computation as a PURE function.

    ``f(i)`` is a scalar getter over the packed float-param layout (SMEM
    scalar-prefetch in the forward kernel, a VMEM row in the grad kernel so
    ``jax.vjp`` of this very function yields the parameter cotangents).
    ``unrolled`` replaces the early-out while_loop with a static chain —
    required under vjp (reverse-mode cannot transpose while_loop).
    Returns (rad_r, rad_g, rad_b).
    """
    present = set(sphere_kinds)
    lam = M.LAMBERTIAN in present
    met = M.METAL in present
    die = M.DIELECTRIC in present
    emi = M.EMISSION in present

    if True:  # keep the historical indentation of the kernel body
        ox_c, oy_c, oz_c = f(_CAM + 0), f(_CAM + 1), f(_CAM + 2)
        hx, hy, hz = f(_CAM + 3), f(_CAM + 4), f(_CAM + 5)
        vx, vy, vz = f(_CAM + 6), f(_CAM + 7), f(_CAM + 8)
        llx, lly, llz = f(_CAM + 9), f(_CAM + 10), f(_CAM + 11)

        # pixel jitter (stream 0) -> camera ray (lib/core/camera.rs:19-24)
        j1, j2 = _stream_uniforms(k0, k1, ray_u32, 0, 2)
        s = (px + j1) * f(_INV_W)
        t = (py + j2) * f(_INV_H)
        dx = llx + s * hx - t * vx - ox_c
        dy = lly + s * hy - t * vy - oy_c
        dz = llz + s * hz - t * vz - oz_c
        ox = jnp.full_like(dx, 0.0) + ox_c
        oy = jnp.full_like(dx, 0.0) + oy_c
        oz = jnp.full_like(dx, 0.0) + oz_c

        one = jnp.ones_like(dx)
        zero = jnp.zeros_like(dx)

        def background(dx, dy, dz):
            ca = (f(_BG + 0), f(_BG + 1), f(_BG + 2))
            if bg_kind == B.UNIFORM:
                return tuple(zero + c for c in ca)
            cb = (f(_BG + 3), f(_BG + 4), f(_BG + 5))
            norm = jax.lax.rsqrt(_dot3(dx, dy, dz, dx, dy, dz))
            tt = 0.5 * (dy * norm + 1.0)
            return tuple((1.0 - tt) * a + tt * b for a, b in zip(ca, cb))

        # Bounce chain as a while_loop with an ALL-DEAD EARLY-OUT: blocks are
        # spatially coherent (consecutive pixels), so sky-only blocks finish
        # after one bounce instead of running all max_depth iterations
        # (docs/performance.md "dead-lane waste").  The liveness mask rides
        # the carry as f32 (Mosaic dislikes i1 loop state).
        def bounce_body(state):
            (b, ox, oy, oz, dx, dy, dz,
             thr_r, thr_g, thr_b, rad_r, rad_g, rad_b, alive_f) = state
            alive = alive_f > 0.0
            # per-bounce uniforms (stream 1 + b): (dir1, dir2, coin)
            u1, u2, u_coin = _stream_uniforms(k0, k1, ray_u32, 1 + b, 3)

            # ---- intersect: unrolled sphere loop, direct quadratic form
            a = _dot3(dx, dy, dz, dx, dy, dz)
            inv_a = 1.0 / a
            t_best = jnp.full_like(dx, jnp.inf)
            best = jnp.full(dx.shape, -1, jnp.int32)
            for i in range(n_spheres):
                base = _SPHERES + i * _SPHERE_STRIDE
                cx, cy, cz = f(base), f(base + 1), f(base + 2)
                r = f(base + 3)
                ocx, ocy, ocz = ox - cx, oy - cy, oz - cz
                half_b = _dot3(ocx, ocy, ocz, dx, dy, dz)
                cq = _dot3(ocx, ocy, ocz, ocx, ocy, ocz) - r * r
                disc = half_b * half_b - a * cq
                ok = disc >= 0.0
                sq = jnp.sqrt(jnp.maximum(disc, 0.0))
                t1 = (-half_b - sq) * inv_a
                t2 = (-half_b + sq) * inv_a
                t1ok = (t1 >= T_MIN) & (t1 <= t_best)
                t2ok = (t2 >= T_MIN) & (t2 <= t_best)
                ti = jnp.where(t1ok, t1, jnp.where(t2ok, t2, jnp.inf))
                better = ok & (ti < t_best)
                t_best = jnp.where(better, ti, t_best)
                best = jnp.where(better, i, best)

            hit = best >= 0

            # background on miss
            bg_r, bg_g, bg_b = background(dx, dy, dz)
            missed = alive & ~hit
            rad_r = rad_r + jnp.where(missed, thr_r * bg_r, 0.0)
            rad_g = rad_g + jnp.where(missed, thr_g * bg_g, 0.0)
            rad_b = rad_b + jnp.where(missed, thr_b * bg_b, 0.0)

            # ---- winner constants via unrolled select chains (no gathers)
            scx = scy = scz = inv_r = zero
            al_r = al_g = al_b = fuzz = ir = em_r = em_g = em_b = zero
            false_ = one < zero
            is_lam = is_met = is_die = is_emi = false_
            for i in range(n_spheres):
                base = _SPHERES + i * _SPHERE_STRIDE
                sel = best == i
                pick = lambda cur, v: jnp.where(sel, v, cur)
                scx = pick(scx, f(base + 0))
                scy = pick(scy, f(base + 1))
                scz = pick(scz, f(base + 2))
                inv_r = pick(inv_r, 1.0 / f(base + 3))
                al_r = pick(al_r, f(base + 4))
                al_g = pick(al_g, f(base + 5))
                al_b = pick(al_b, f(base + 6))
                fuzz = pick(fuzz, f(base + 7))
                ir = pick(ir, f(base + 8))
                em_r = pick(em_r, f(base + 9))
                em_g = pick(em_g, f(base + 10))
                em_b = pick(em_b, f(base + 11))
                k = sphere_kinds[i]  # static
                if k == M.LAMBERTIAN:
                    is_lam = is_lam | sel
                elif k == M.METAL:
                    is_met = is_met | sel
                elif k == M.DIELECTRIC:
                    is_die = is_die | sel
                elif k == M.EMISSION:
                    is_emi = is_emi | sel

            # hit point + front-face-flipped outward normal
            ptx = ox + t_best * dx
            pty = oy + t_best * dy
            ptz = oz + t_best * dz
            nx = (ptx - scx) * inv_r
            ny = (pty - scy) * inv_r
            nz = (ptz - scz) * inv_r
            front = _dot3(dx, dy, dz, nx, ny, nz) < 0.0
            sgn = jnp.where(front, 1.0, -1.0)
            nx, ny, nz = nx * sgn, ny * sgn, nz * sgn

            # unit-sphere-surface sample from (u1, u2)
            zs = 1.0 - 2.0 * u1
            rs = jnp.sqrt(jnp.maximum(0.0, 1.0 - zs * zs))
            phi = (2.0 * np.float32(np.pi)) * u2
            sx = rs * jnp.cos(phi)
            sy = rs * jnp.sin(phi)
            sz = zs

            def lambert_dir():
                ldx, ldy, ldz = nx + sx, ny + sy, nz + sz
                deg = (
                    (jnp.abs(ldx) < 1e-8)
                    & (jnp.abs(ldy) < 1e-8)
                    & (jnp.abs(ldz) < 1e-8)
                )
                return (
                    jnp.where(deg, nx, ldx),
                    jnp.where(deg, ny, ldy),
                    jnp.where(deg, nz, ldz),
                )

            if clay:
                at_r = at_g = at_b = zero + 0.8
                ndx, ndy, ndz = lambert_dir()
                scatters = zero < one
            else:
                at_r, at_g, at_b = zero, zero, zero
                ndx, ndy, ndz = nx, ny, nz
                scatters = zero < one

                if lam:
                    ldx, ldy, ldz = lambert_dir()
                    at_r = jnp.where(is_lam, al_r, at_r)
                    at_g = jnp.where(is_lam, al_g, at_g)
                    at_b = jnp.where(is_lam, al_b, at_b)
                    ndx = jnp.where(is_lam, ldx, ndx)
                    ndy = jnp.where(is_lam, ldy, ndy)
                    ndz = jnp.where(is_lam, ldz, ndz)

                if met:
                    dn = _dot3(dx, dy, dz, nx, ny, nz)
                    rfx = dx - 2.0 * dn * nx
                    rfy = dy - 2.0 * dn * ny
                    rfz = dz - 2.0 * dn * nz
                    inv_len = jax.lax.rsqrt(jnp.maximum(
                        _dot3(rfx, rfy, rfz, rfx, rfy, rfz), 1e-30
                    ))
                    mdx = rfx * inv_len + fuzz * sx
                    mdy = rfy * inv_len + fuzz * sy
                    mdz = rfz * inv_len + fuzz * sz
                    m_ok = _dot3(mdx, mdy, mdz, nx, ny, nz) > 0.0
                    keep = is_met & m_ok
                    at_r = jnp.where(is_met, jnp.where(m_ok, al_r, 0.0), at_r)
                    at_g = jnp.where(is_met, jnp.where(m_ok, al_g, 0.0), at_g)
                    at_b = jnp.where(is_met, jnp.where(m_ok, al_b, 0.0), at_b)
                    ndx = jnp.where(is_met, mdx, ndx)
                    ndy = jnp.where(is_met, mdy, ndy)
                    ndz = jnp.where(is_met, mdz, ndz)
                    # Mosaic cannot select on i1 vectors; boolean algebra
                    scatters = (is_met & m_ok) | (~is_met & scatters)

                if die:
                    ratio = jnp.where(front, 1.0 / ir, ir)
                    inv_len = jax.lax.rsqrt(jnp.maximum(a, 1e-30))
                    udx, udy, udz = dx * inv_len, dy * inv_len, dz * inv_len
                    cos_t = jnp.minimum(
                        -_dot3(nx, ny, nz, udx, udy, udz), 1.0
                    )
                    sin_t = jnp.sqrt(jnp.maximum(0.0, 1.0 - cos_t * cos_t))
                    r0 = (1.0 - ratio) / (1.0 + ratio)
                    r0 = r0 * r0
                    omc = 1.0 - cos_t
                    omc2 = omc * omc
                    schl = r0 + (1.0 - r0) * omc2 * omc2 * omc
                    refl = (ratio * sin_t > 1.0) | (schl > u_coin)
                    udn = _dot3(udx, udy, udz, nx, ny, nz)
                    rx = udx - 2.0 * udn * nx
                    ry = udy - 2.0 * udn * ny
                    rz = udz - 2.0 * udn * nz
                    perp_x = ratio * (udx + cos_t * nx)
                    perp_y = ratio * (udy + cos_t * ny)
                    perp_z = ratio * (udz + cos_t * nz)
                    par = -jnp.sqrt(jnp.maximum(jnp.abs(
                        1.0 - _dot3(perp_x, perp_y, perp_z,
                                    perp_x, perp_y, perp_z)
                    ), 1e-12))
                    ddx = jnp.where(refl, rx, perp_x + par * nx)
                    ddy = jnp.where(refl, ry, perp_y + par * ny)
                    ddz = jnp.where(refl, rz, perp_z + par * nz)
                    at_r = jnp.where(is_die, 1.0, at_r)
                    at_g = jnp.where(is_die, 1.0, at_g)
                    at_b = jnp.where(is_die, 1.0, at_b)
                    ndx = jnp.where(is_die, ddx, ndx)
                    ndy = jnp.where(is_die, ddy, ndy)
                    ndz = jnp.where(is_die, ddz, ndz)

                if emi:
                    at_r = jnp.where(is_emi, em_r, at_r)
                    at_g = jnp.where(is_emi, em_g, at_g)
                    at_b = jnp.where(is_emi, em_b, at_b)
                    scatters = scatters & ~is_emi

            terminal = alive & hit & ~scatters
            rad_r = rad_r + jnp.where(terminal, thr_r * at_r, 0.0)
            rad_g = rad_g + jnp.where(terminal, thr_g * at_g, 0.0)
            rad_b = rad_b + jnp.where(terminal, thr_b * at_b, 0.0)

            cont = alive & hit & scatters
            thr_r = jnp.where(cont, thr_r * at_r, thr_r)
            thr_g = jnp.where(cont, thr_g * at_g, thr_g)
            thr_b = jnp.where(cont, thr_b * at_b, thr_b)
            ox = jnp.where(cont, ptx, ox)
            oy = jnp.where(cont, pty, oy)
            oz = jnp.where(cont, ptz, oz)
            dx = jnp.where(cont, ndx, dx)
            dy = jnp.where(cont, ndy, dy)
            dz = jnp.where(cont, ndz, dz)
            alive_f = jnp.where(cont, 1.0, 0.0)
            return (b + 1, ox, oy, oz, dx, dy, dz,
                    thr_r, thr_g, thr_b, rad_r, rad_g, rad_b, alive_f)

        def bounce_cond(state):
            b, *_, alive_f = state
            return (b < max_depth) & (jnp.max(alive_f) > 0.0)

        state = (jnp.int32(0), ox, oy, oz, dx, dy, dz,
                 one, one, one, zero, zero, zero, one)
        if unrolled or os.environ.get("RTRT_MEGAKERNEL_UNROLL") == "1":
            # static chain: required under vjp; also the perf-ablation knob
            # (measured equal on benchmark.json — docs/performance.md)
            for _ in range(max_depth):
                state = bounce_body(state)
        else:
            state = jax.lax.while_loop(bounce_cond, bounce_body, state)
        return state[10], state[11], state[12]


def _make_kernel(n_spheres, max_depth, sphere_kinds, bg_kind, clay):
    """Forward kernel: sphere_kinds is a static tuple of material-kind ids,
    one per sphere; fparams rides scalar-prefetch SMEM."""

    def kernel(iparams, fparams, ray_id_ref, px_ref, py_ref,
               out_r, out_g, out_b):
        seed_hi = iparams[0].astype(jnp.uint32)
        seed_lo = iparams[1].astype(jnp.uint32)
        ray_id = ray_id_ref[...]
        ray_u32 = ray_id.astype(jnp.uint32)
        k0 = jnp.full(ray_id.shape, 0, jnp.uint32) + seed_hi
        k1 = jnp.full(ray_id.shape, 0, jnp.uint32) + seed_lo

        rad_r, rad_g, rad_b = _radiance_math(
            lambda i: fparams[i], k0, k1, ray_u32, px_ref[...], py_ref[...],
            n_spheres=n_spheres, max_depth=max_depth,
            sphere_kinds=sphere_kinds, bg_kind=bg_kind, clay=clay,
            unrolled=False,
        )
        out_r[...] = rad_r
        out_g[...] = rad_g
        out_b[...] = rad_b

    return kernel


def _make_grad_kernel(n_spheres, max_depth, sphere_kinds, bg_kind, clay,
                      k_params):
    """Fused forward-replay + backward kernel.

    ``jax.vjp`` over :func:`_radiance_math` traces reverse-mode AD INTO the
    kernel: the unrolled bounce chain's residuals live in VMEM/registers for
    the whole fwd+bwd of a ray block — the whole point; the XLA grad path
    round-trips every residual through HBM.  Parameter cotangents accumulate
    across grid steps into one (1, K) block (TPU grid steps run sequentially
    on the core, so += is race-free).
    """

    def kernel(iparams, fp_ref, ray_id_ref, px_ref, py_ref,
               g_r_ref, g_g_ref, g_b_ref, dfp_ref):
        seed_hi = iparams[0].astype(jnp.uint32)
        seed_lo = iparams[1].astype(jnp.uint32)
        ray_id = ray_id_ref[...]
        ray_u32 = ray_id.astype(jnp.uint32)
        k0 = jnp.full(ray_id.shape, 0, jnp.uint32) + seed_hi
        k1 = jnp.full(ray_id.shape, 0, jnp.uint32) + seed_lo
        px = px_ref[...]
        py = py_ref[...]

        def block_radiance(fp_row):
            return _radiance_math(
                lambda i: fp_row[0, i], k0, k1, ray_u32, px, py,
                n_spheres=n_spheres, max_depth=max_depth,
                sphere_kinds=sphere_kinds, bg_kind=bg_kind, clay=clay,
                unrolled=True,
            )

        _, vjp_fn = jax.vjp(block_radiance, fp_ref[...])
        (dfp,) = vjp_fn((g_r_ref[...], g_g_ref[...], g_b_ref[...]))

        @pl.when(pl.program_id(0) == 0)
        def _init():
            dfp_ref[...] = jnp.zeros_like(dfp_ref)

        dfp_ref[...] += dfp

    return kernel


# ------------------------------------------------------------------ driver

@functools.lru_cache(maxsize=64)
def _radiance_cvjp(n_spheres, max_depth, sphere_kinds, bg_kind, clay,
                   rows, interpret):
    """custom_vjp-wrapped block radiance for one static configuration.

    Primal: the early-out forward kernel.  Backward: the fused
    forward-replay + vjp kernel (_make_grad_kernel) — the entire
    differentiable step never spills the wavefront to HBM.  Cached per
    static config so jit re-traces reuse the same custom_vjp instance.
    """
    shape2d = (rows, BLOCK_COLS)
    grid = rows // BLOCK_ROWS
    block = pl.BlockSpec(
        (BLOCK_ROWS, BLOCK_COLS), lambda i, *_: (i, 0),
        memory_space=pltpu.VMEM,
    )
    out = jax.ShapeDtypeStruct(shape2d, jnp.float32)

    fwd_kernel = _make_kernel(n_spheres, max_depth, sphere_kinds, bg_kind,
                              clay)
    fwd_grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(grid,),
        in_specs=[block, block, block],
        out_specs=[block, block, block],
    )

    def run_forward(iparams, fparams, ray_ids, px, py):
        return pl.pallas_call(
            fwd_kernel,
            grid_spec=fwd_grid_spec,
            out_shape=[out, out, out],
            interpret=interpret,
        )(iparams, fparams, ray_ids, px, py)

    k = int(_SPHERES + n_spheres * _SPHERE_STRIDE)
    k_pad = -(-k // 128) * 128
    grad_kernel = _make_grad_kernel(n_spheres, max_depth, sphere_kinds,
                                    bg_kind, clay, k_pad)
    param_block = pl.BlockSpec((1, k_pad), lambda i, *_: (0, 0),
                               memory_space=pltpu.VMEM)
    grad_grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(grid,),
        in_specs=[param_block, block, block, block, block, block, block],
        out_specs=[param_block],
    )

    def run_grad(iparams, fparams, ray_ids, px, py, g_r, g_g, g_b):
        fp_row = jnp.zeros((1, k_pad), jnp.float32).at[0, :k].set(fparams)
        (dfp,) = pl.pallas_call(
            grad_kernel,
            grid_spec=grad_grid_spec,
            out_shape=[jax.ShapeDtypeStruct((1, k_pad), jnp.float32)],
            interpret=interpret,
        )(iparams, fp_row, ray_ids, px, py, g_r, g_g, g_b)
        return dfp[0, :k]

    @jax.custom_vjp
    def radiance(fparams, iparams, ray_ids, px, py):
        return run_forward(iparams, fparams, ray_ids, px, py)

    def radiance_fwd(fparams, iparams, ray_ids, px, py):
        primal = run_forward(iparams, fparams, ray_ids, px, py)
        return primal, (fparams, iparams, ray_ids, px, py)

    def radiance_bwd(res, cts):
        fparams, iparams, ray_ids, px, py = res
        g_r, g_g, g_b = cts
        dfp = run_grad(iparams, fparams, ray_ids, px, py, g_r, g_g, g_b)
        f0 = jax.dtypes.float0
        return (dfp,
                np.zeros(iparams.shape, f0),
                np.zeros(ray_ids.shape, f0),
                jnp.zeros_like(px), jnp.zeros_like(py))

    radiance.defvjp(radiance_fwd, radiance_bwd)
    return radiance


def _pack_fparams(scene: Scene, width: int, height: int):
    """Runtime scene constants -> (K,) f32 (traced; no host sync)."""
    origin, horizontal, vertical, lower_left = scene.camera.ray_origin()
    bg = scene.background
    bg_a = bg.color_a
    bg_b = bg.color_b if bg.color_b is not None else bg.color_a
    mats = scene.materials
    mat_id = scene.spheres.material
    per_sphere = jnp.concatenate(
        [
            scene.spheres.center,                       # cx cy cz
            scene.spheres.radius[:, None],              # r
            mats.albedo[mat_id],                        # al_r al_g al_b
            mats.fuzz[mat_id][:, None],                 # fuzz
            mats.ir[mat_id][:, None],                   # ir
            mats.emission[mat_id],                      # em_r em_g em_b
        ],
        axis=1,
    ).reshape(-1)
    head = jnp.concatenate([
        origin, horizontal, vertical, lower_left,
        bg_a, bg_b,
        jnp.array([1.0 / (width - 1), 1.0 / (height - 1)], jnp.float32),
    ])
    return jnp.concatenate([head, per_sphere]).astype(jnp.float32)


def _sphere_kinds(scene: Scene) -> tuple:
    kinds = np.asarray(scene.materials.kind)
    mat = np.asarray(scene.spheres.material)
    return tuple(int(kinds[m]) for m in mat)


def seed_words(seed: int):
    """Python int seed -> (2,) i32 (hi, lo) key words, the layout of
    jax.random.key(seed) for the threefry implementation."""
    return jnp.array(
        [(seed >> 32) & 0xFFFFFFFF, seed & 0xFFFFFFFF], jnp.int32
    )


def pixel_radiance_pallas(scene: Scene, pixel_ids, width: int, height: int,
                          iparams, *, sphere_kinds: tuple | None = None,
                          interpret: bool = False):
    """Mean clamped radiance per pixel -> (P, 3), via the megakernel.

    Drop-in twin of render.pixel_radiance for supported scenes.  ``iparams``
    is seed_words(seed) — an array, so re-seeding never recompiles.
    ``sphere_kinds`` (static tuple of per-sphere material-kind ids, from
    :func:`_sphere_kinds`) must be supplied when the scene is traced.
    ``interpret`` runs the kernel in the Pallas interpreter (CPU tests).
    """
    if sphere_kinds is None:
        sphere_kinds = _sphere_kinds(scene)
    spp = scene.settings.samples_per_pixel
    p = pixel_ids.shape[0]
    n_rays = p * spp

    ray_ids = (
        pixel_ids[:, None] * spp + jnp.arange(spp, dtype=jnp.int32)[None, :]
    ).reshape(-1)
    pid = jnp.repeat(pixel_ids, spp)
    px = (pid % width).astype(jnp.float32)
    py = (pid // width).astype(jnp.float32)

    pad = (-n_rays) % BLOCK
    if pad:
        ray_ids = jnp.concatenate([ray_ids, jnp.zeros(pad, jnp.int32)])
        px = jnp.concatenate([px, jnp.zeros(pad, jnp.float32)])
        py = jnp.concatenate([py, jnp.zeros(pad, jnp.float32)])
    total = n_rays + pad
    rows = total // BLOCK_COLS

    shape2d = (rows, BLOCK_COLS)
    ray_ids = ray_ids.reshape(shape2d)
    px = px.reshape(shape2d)
    py = py.reshape(shape2d)

    fparams = _pack_fparams(scene, width, height)

    # Differentiable: gradients w.r.t. scene parameters flow through
    # _pack_fparams (plain jnp) into the custom_vjp, whose backward is the
    # fused Pallas forward-replay+vjp kernel.
    radiance_fn = _radiance_cvjp(
        len(scene.spheres),
        scene.settings.max_ray_depth,
        sphere_kinds,
        scene.background.kind,
        scene.settings.mode == MODE_CLAY,
        rows,
        interpret,
    )
    rad_r, rad_g, rad_b = radiance_fn(fparams, iparams, ray_ids, px, py)

    radiance = jnp.stack(
        [rad_r.reshape(-1), rad_g.reshape(-1), rad_b.reshape(-1)], axis=-1
    )[:n_rays]
    radiance = jnp.clip(radiance, 0.0, scene.settings.clamp_indirect)
    return radiance.reshape(p, spp, 3).mean(axis=1)
