"""Differentiable shading replay over recorded BVH-kernel hits.

The packet-traversal Pallas kernel (ops/pallas_megakernel.py) is forward
control flow — its traversal while_loop has no AD rule.  But the gradient
estimator already DETACHES discrete hit decisions (diff/grad.py docstring),
so exact parameter gradients only need the *shading chain* re-run over the
hits the kernel found.  The kernel's record mode writes, per bounce, the
winning primitive's chunk-permutation slot (sphere-tree slots first,
triangle slots offset by the sphere span; -1 = miss); this module replays
the bounce chain over those fixed hits in plain XLA:

  * hit t / normals are RECOMPUTED from the recorded primitive's parameters
    (direct quadratic / Moller-Trumbore forms — the same arithmetic as the
    kernel's leaf intersectors), so geometry gradients (sphere center and
    radius, triangle vertices) flow;
  * material shading reuses ops/shade.py's branchless lobes with the same
    counter-based uniforms the kernel consumed, so directions and
    throughput match the kernel's to f32 arithmetic order;
  * one (R,)-sized gather per bounce replaces a traversal per bounce —
    this is what makes mesh/BVH-class inverse rendering run at Pallas
    speed instead of the dense XLA intersector's.

Reference semantics per bounce: trace_ray (lib/core/render.rs:32-59);
the replay is the recursion's multiply chain with hits pinned.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..models.scene import MODE_CLAY, Scene
from ..ops import shade as shade_ops
from ..ops.intersect import TRI_DET_EPS
from ..utils import rng, vec
from ..utils.types import T_MIN


def replay_rows_radiance(scene: Scene, tens, rec_raw, key_words, ray_ids,
                         px, py, width: int, height: int, *, rows: int,
                         max_depth: int, n_sph_chunks: int,
                         n_tri_chunks: int, interpret: bool,
                         clay: bool = False, group: int = 10):
    """Gather-free differentiable replay over KERNEL-FETCHED winner rows.

    The classic :func:`replay_radiance` fetches each recorded winner's
    constants with table gathers — ~7 ns/element scalar loops on TPU that
    dominated BVH-class fit steps (376 ms of a 728 ms monkey-d50 step,
    docs/performance.md r5).  Here the winner rows are materialized by the
    Pallas fetch kernel (ops.pallas_megakernel._fetch_rows_cvjp — VMEM
    one-hot matmuls, custom_vjp'd so row cotangents scatter back onto the
    chunk matrices in-kernel), and this function is PURE ELEMENTWISE XLA:
    per bounce it slices the fetched slab, recomputes the winner's
    t/normal in replay_radiance's exact op order, and shades with the
    recorded branch bits.

    ``tens``: the differentiable chunk matrices ([sph_s][, tri_g, tri_s]
    from _bvh_prep) — material/geometry cotangents flow through the fetch;
    camera/background cotangents flow through ``scene`` directly.
    ``rec_raw``: the record kernel's (rows * max_depth, 256) buffer.
    ``group``: bounces per fetch-kernel launch (bounds the slab to
    rows * group * 26 * 1 KB of HBM).

    Gate (callers): non-mix, no volumes, no mesh volumes, UNIFORM/GRADIENT
    background.  Reference semantics per bounce: trace_ray
    (lib/core/render.rs:32-59) with hits pinned by the records.
    """
    from ..ops.pallas_megakernel import (_BS_AL, _BS_DIE, _BS_EM, _BS_EMI,
                                         _BS_FUZZ, _BS_GEO, _BS_IR,
                                         _BS_LAM, _BS_MET, _BS_RAD,
                                         _TG_E1, _TG_E2, _TG_V0, BVH_LEAF,
                                         FETCH_F, FETCH_GEO0,
                                         _fetch_rows_cvjp,
                                         _fetch_wide_tabs)

    key = jnp.asarray(key_words).astype(jnp.uint32)
    n_rays = ray_ids.shape[0]
    grid_i = rows // 8
    sph_span = n_sph_chunks * BVH_LEAF
    F = FETCH_F if n_tri_chunks else 16
    has_sph = n_sph_chunks > 0
    has_tri = n_tri_chunks > 0
    wide_tabs, (sph_span_p, tri_span_p) = _fetch_wide_tabs(
        tens, n_sph_chunks, n_tri_chunks)

    inv_w = 1.0 / (width - 1)
    inv_h = 1.0 / (height - 1)
    j = rng.ray_uniforms(key, ray_ids, 0, 2)
    s = (px + j[:, 0]) * inv_w
    t = (py + j[:, 1]) * inv_h
    o, d = scene.camera.get_rays(s, t)

    thr = jnp.ones_like(o)
    rad = jnp.zeros_like(o)
    alive = jnp.ones(o.shape[:-1], bool)

    rec_view = rec_raw.reshape(grid_i, max_depth, 8, 256)

    def rec_col(b):
        return rec_view[:, b].reshape(-1)[:n_rays]

    slab = None
    slab_b0 = -1
    for b in range(max_depth):
        if slab is None or b >= slab_b0 + slab.shape[1]:
            nb = min(group, max_depth - b)
            fetch = _fetch_rows_cvjp(rows, nb, sph_span, sph_span_p,
                                     tri_span_p, interpret)
            rec_g = rec_view[:, b:b + nb].reshape(-1, 256)
            slab = fetch(rec_g, *wide_tabs).reshape(grid_i, nb, F,
                                                    8 * 256)
            slab_b0 = b

        def fld(jf, b=b):
            return slab[:, b - slab_b0, jf].reshape(-1)[:n_rays]

        raw = rec_col(b)
        hit = alive & (raw >= 0)
        front = ((raw >> 27) & 1) == 1
        m_ok = ((raw >> 28) & 1).astype(bool)
        refl = ((raw >> 29) & 1).astype(bool)
        code = jnp.where(hit, raw & ((1 << 27) - 1), -1)
        is_sph = hit & (code >= 0) & (code < sph_span)
        is_tri = hit & (code >= sph_span)

        a = vec.length_squared(d)
        t_hit = jnp.ones(code.shape, jnp.float32)
        gx, gy, gz = fld(_BS_GEO + 0), fld(_BS_GEO + 1), fld(_BS_GEO + 2)
        if has_sph:
            r_s = fld(_BS_RAD)
            c3 = jnp.stack([gx, gy, gz], axis=-1)
            oc = o - c3
            hb = vec.dot(oc, d)
            cq = vec.length_squared(oc) - r_s * r_s
            disc = hb * hb - a * cq
            dsafe = jnp.where(is_sph, jnp.maximum(disc, 1e-24), 1.0)
            sq = jnp.sqrt(dsafe)
            t1 = (-hb - sq) / a
            t2 = (-hb + sq) / a
            t_s = jnp.where(t1 >= T_MIN, t1, t2)
            t_hit = jnp.where(is_sph, t_s, t_hit)
        if has_tri:
            v0 = jnp.stack([fld(FETCH_GEO0 + _TG_V0 + k)
                            for k in range(3)], axis=-1)
            e1 = jnp.stack([fld(FETCH_GEO0 + _TG_E1 + k)
                            for k in range(3)], axis=-1)
            e2 = jnp.stack([fld(FETCH_GEO0 + _TG_E2 + k)
                            for k in range(3)], axis=-1)
            h = vec.cross(d, e2)
            at = vec.dot(e1, h)
            f = 1.0 / jnp.where(jnp.abs(at) > TRI_DET_EPS, at, 1.0)
            sv = o - v0
            q = vec.cross(sv, e1)
            t_t = f * vec.dot(e2, q)
            t_hit = jnp.where(is_tri, t_t, t_hit)

        t_safe = jnp.where(hit, t_hit, 1.0)
        point = o + t_safe[:, None] * d
        g3 = jnp.stack([gx, gy, gz], axis=-1)
        if has_sph:
            r_div = jnp.where(is_sph & (r_s > 0.0), r_s, 1.0)
            n_out = jnp.where(is_sph[:, None],
                              (point - g3) / r_div[:, None], g3)
        else:
            n_out = g3

        missed = alive & (raw < 0)
        bg_rad = scene.background.sample(d)
        rad = rad + jnp.where(missed[:, None], thr * bg_rad, 0.0)

        n = jnp.where(front[:, None], n_out, -n_out)
        # MISS lanes fetch all-zero rows (the classic replay's clamped
        # gathers read real rows instead): substitute a unit normal so
        # normalize/refract junk math on dead lanes can never emit a NaN
        # whose zero-cotangent product poisons the vjp
        n = jnp.where(hit[:, None], n,
                      jnp.array([0.0, 0.0, 1.0], jnp.float32))
        u = rng.ray_uniforms(key, ray_ids, 1 + b, 4)
        u1, u2, u_coin, u_r = u[:, 0], u[:, 1], u[:, 2], u[:, 3]
        sphere_dir = rng.unit_sphere_surface(u1, u2)

        if clay:
            lam_dir = n + sphere_dir
            lam_dir = jnp.where(vec.near_zero(lam_dir)[..., None], n,
                                lam_dir)
            atten = jnp.full(n.shape, 0.8)
            new_dir = lam_dir
            scatters = jnp.ones(code.shape, bool)
        else:
            albedo = jnp.stack([fld(_BS_AL + k) for k in range(3)],
                               axis=-1)
            emission = jnp.stack([fld(_BS_EM + k) for k in range(3)],
                                 axis=-1)
            fuzz = fld(_BS_FUZZ)
            # miss lanes fetch all-zero rows: guard ir (see shade_ops)
            ir_row = fld(_BS_IR)
            ir = jnp.where(ir_row > 0.0, ir_row, 1.0)
            is_lam = fld(_BS_LAM) > 0.5
            is_met = fld(_BS_MET) > 0.5
            is_die = fld(_BS_DIE) > 0.5
            is_emi = fld(_BS_EMI) > 0.5
            is_iso = hit & ~(is_lam | is_met | is_die | is_emi)

            white = jnp.ones_like(albedo)
            black = jnp.zeros_like(albedo)
            lam_dir = n + sphere_dir
            lam_dir = jnp.where(vec.near_zero(lam_dir)[..., None], n,
                                lam_dir)
            reflected = vec.normalize(vec.reflect(d, n))
            metal_dir = reflected + fuzz[..., None] * sphere_dir
            ratio = jnp.where(front, 1.0 / ir, ir)
            ud = vec.normalize(d)
            cos_theta = jnp.minimum(vec.dot(n, -ud), 1.0)
            r0 = (1.0 - ratio) / (1.0 + ratio)
            r0 = r0 * r0
            diel_dir = jnp.where(
                refl[..., None],
                vec.reflect(ud, n),
                vec.refract(ud, n, ratio),
            )
            iso_dir = sphere_dir * rng.cbrt01(u_r)[..., None]

            conds = [is_lam[..., None], is_met[..., None],
                     is_die[..., None], is_emi[..., None],
                     is_iso[..., None]]
            atten = jnp.select(
                conds,
                [albedo, jnp.where(m_ok[..., None], albedo, black),
                 white, emission, albedo],
                default=black)
            new_dir = jnp.select(
                conds, [lam_dir, metal_dir, diel_dir, n, iso_dir],
                default=n)
            scatters = jnp.select(
                [is_lam, is_met, is_die, is_emi, is_iso],
                [jnp.ones(code.shape, bool), m_ok,
                 jnp.ones(code.shape, bool),
                 jnp.zeros(code.shape, bool),
                 jnp.ones(code.shape, bool)],
                default=jnp.ones(code.shape, bool))

        terminal = hit & ~scatters
        rad = rad + jnp.where(terminal[:, None], thr * atten, 0.0)
        cont = hit & scatters
        thr = jnp.where(cont[:, None], thr * atten, thr)
        o = jnp.where(cont[:, None], point, o)
        d = jnp.where(cont[:, None], new_dir, d)
        alive = cont
    return rad


def replay_radiance(scene: Scene, rec, key_words, ray_ids, px, py,
                    width: int, height: int, env=None):
    """(R, max_depth) winner records -> per-ray radiance (R, 3).

    Differentiable in every material / camera / background / geometry leaf
    of ``scene``.  ``key_words``: the kernel's (2,) seed words (iparams);
    ``ray_ids``/``px``/``py``: flat (R,) ray metadata exactly as fed to the
    kernel (global ids keep the RNG byte-identical to the kernel's draws).

    ``env``: None, or {"occlude": fn(point (R,3), d_l (R,3), bounce) ->
    (R,) bool} — switches the replay to the one-sample-MIS environment
    estimator (the EXACT math of render/integrator.py's env_is blocks:
    NEE toward a luminance-sampled sky direction with a balance-heuristic
    weight, BSDF-sampled misses weighted by the complementary factor).
    The occlusion callback is the kernel-speed shadow-ray test
    (ops.pallas_megakernel.occlusion_bvh); its result is a discrete mask
    (non-differentiable by construction).  This is what lets HDRI
    importance-sampled scenes run on the Pallas path: the record kernel's
    naive WALK visits the same hits the MIS estimator shades (NEE only
    adds contributions; it never changes the path), so the replay can
    assemble the full estimator from the records.
    """
    cb = scene.cbvh
    key = jnp.asarray(key_words).astype(jnp.uint32)
    lf = cb.leaf_size
    sph_span = cb.n_sph_chunks * lf
    vol_span = cb.n_vol_chunks * lf
    tri_span = cb.n_tri_chunks * lf
    n_vol = scene.spheres.num_volumes
    n_mv = scene.num_mesh_volumes
    settings = scene.settings
    clay = settings.mode == MODE_CLAY
    max_depth = settings.max_ray_depth

    # camera ray: the kernel's exact arithmetic (multiply by 1/(dim-1))
    inv_w = 1.0 / (width - 1)
    inv_h = 1.0 / (height - 1)
    j = rng.ray_uniforms(key, ray_ids, 0, 2)
    s = (px + j[:, 0]) * inv_w
    t = (py + j[:, 1]) * inv_h
    o, d = scene.camera.get_rays(s, t)

    thr = jnp.ones_like(o)
    rad = jnp.zeros_like(o)
    alive = jnp.ones(o.shape[:-1], bool)
    mis_pdf = jnp.zeros(o.shape[:-1])  # 0 = no MIS for primary rays

    # permutation slot -> original primitive id (pad slots clamp to 0; a
    # pad lane never wins so the dummy gather is always masked out)
    sph_perm = jnp.maximum(cb.sph_perm, 0) if sph_span else None
    vol_perm = jnp.maximum(cb.vol_perm, 0) if vol_span else None
    tri_perm = jnp.maximum(cb.tri_perm, 0) if tri_span else None

    # mix scenes shift the per-bounce uniform columns by MAX_MIX_DEPTH
    # (ops/shade.py shade_uniforms) — the kernel consumed the same layout,
    # and the level-0 coin re-resolves each recorded winner's mix here
    n_shade = shade_ops.shade_uniforms(scene.materials)
    for b in range(max_depth):
        u = rng.ray_uniforms(key, ray_ids, 1 + b, n_shade + n_vol + n_mv)
        u_vol = u[:, n_shade:]
        raw = rec[:, b]
        hit = alive & (raw >= 0)
        # bits 0-26: winner slot; 27-29: the primal's recorded DISCRETE
        # shading decisions (front / metal_ok / dielectric_reflect) — the
        # replay takes exactly the kernel's branches instead of
        # recomputing ulp-sensitive comparisons (exact replay, r4)
        code = raw & ((1 << 27) - 1)
        code = jnp.where(hit, code, raw)  # misses keep -1
        front_rec = (raw >> 27) & 1
        m_ok_rec = ((raw >> 28) & 1).astype(bool)
        refl_rec = ((raw >> 29) & 1).astype(bool)
        is_sph = hit & (code < sph_span)
        is_vol = hit & (code >= sph_span) & (code < sph_span + vol_span)
        mv_base = sph_span + vol_span + tri_span
        is_tri = hit & (code >= sph_span + vol_span) & (code < mv_base)
        is_mv = hit & (code >= mv_base)

        a = vec.length_squared(d)
        t_hit = jnp.ones(code.shape, jnp.float32)
        n_out = jnp.zeros_like(o)
        mid = jnp.zeros(code.shape, jnp.int32)
        if sph_span:
            sidx = sph_perm[jnp.clip(code, 0, sph_span - 1)]
            c = scene.spheres.center[sidx]
            r = scene.spheres.radius[sidx]
            oc = o - c
            hb = vec.dot(oc, d)
            cq = vec.length_squared(oc) - r * r
            disc = hb * hb - a * cq
            # double-where: non-selected lanes keep a dummy positive disc
            # so sqrt never sees 0/negative under the vjp
            dsafe = jnp.where(is_sph, jnp.maximum(disc, 1e-24), 1.0)
            sq = jnp.sqrt(dsafe)
            t1 = (-hb - sq) / a
            t2 = (-hb + sq) / a
            # winner root rule (see _sphere_chunk_hit): the accepted t of
            # the WINNING sphere is the near root when >= T_MIN, else the
            # far root (a near root beyond the best-so-far t implies the
            # far root is too, so that sphere cannot have won)
            t_s = jnp.where(t1 >= T_MIN, t1, t2)
            t_hit = jnp.where(is_sph, t_s, t_hit)
            mid = jnp.where(is_sph, scene.spheres.material[sidx], mid)
        if vol_span:
            vidx = vol_perm[jnp.clip(code - sph_span, 0,
                                     vol_span - 1)]
            c = scene.spheres.center[vidx]
            r = scene.spheres.radius[vidx]
            oc = o - c
            hb = vec.dot(oc, d)
            cq = vec.length_squared(oc) - r * r
            disc = hb * hb - a * cq
            dsafe = jnp.where(is_vol, jnp.maximum(disc, 1e-24), 1.0)
            sq = jnp.sqrt(dsafe)
            t1 = (-hb - sq) / a
            t2 = (-hb + sq) / a
            # constant-density free flight over the recorded winner's
            # boundary window (lib/volume.rs:35-73), with the winner's own
            # free-flight uniform column — same arithmetic as
            # _vol_chunk_hit; differentiable in center/radius/density
            ordinal = jnp.clip(vidx - scene.spheres.num_solid, 0,
                               max(n_vol - 1, 0))
            uu = jnp.take_along_axis(u_vol[:, :max(n_vol, 1)],
                                     ordinal[:, None], axis=1)[:, 0]
            nid = scene.spheres.neg_inv_density[vidx]
            ray_len = jnp.sqrt(a)
            h1 = jnp.maximum(jnp.maximum(t1, T_MIN), 0.0)
            hit_dist = nid * jnp.log(jnp.maximum(uu, 1e-37))
            t_v = h1 + hit_dist / ray_len
            t_hit = jnp.where(is_vol, t_v, t_hit)
            mid = jnp.where(is_vol, scene.spheres.material[vidx], mid)
        if tri_span:
            tidx = tri_perm[jnp.clip(code - sph_span - vol_span, 0,
                                     tri_span - 1)]
            tris = scene.triangles
            v0 = tris.v0[tidx]
            e1 = tris.e1[tidx]
            e2 = tris.e2[tidx]
            h = vec.cross(d, e2)
            at = vec.dot(e1, h)
            f = 1.0 / jnp.where(jnp.abs(at) > TRI_DET_EPS, at, 1.0)
            sv = o - v0
            q = vec.cross(sv, e1)
            t_t = f * vec.dot(e2, q)
            t_hit = jnp.where(is_tri, t_t, t_hit)
            mid = jnp.where(is_tri, tris.material[tidx], mid)
        if n_mv:
            # mesh-bounded volume winners: recompute the recorded
            # volume's free-flight t with the SAME uniform column the
            # kernel consumed.  Crossing times scan the volume's chunks
            # under a fori_loop with DETACHED geometry — (R, leaf_size)
            # working set instead of a dense (R, T) matrix (a house-fog
            # fit would OOM on the dense form), and no vjp residuals.
            # Boundary-VERTEX gradients through crossing times are
            # therefore detached (silhouette-class, out of scope per
            # SURVEY hard part (b)); density + phase-material gradients
            # flow.  A recorded winner whose XLA recompute ulp-flips to
            # "no crossing" falls back to t=1 (gradient noise on that
            # ray, never an inf/NaN poisoning the step).
            import dataclasses as _dc

            from ..ops.intersect import INF, triangle_ts_raw

            tris_d = jax.lax.stop_gradient(scene.triangles)
            o_d = jax.lax.stop_gradient(o)
            d_d = jax.lax.stop_gradient(d)
            lf_ = cb.leaf_size
            ray_len = jnp.sqrt(vec.length_squared(d_d))
            vsel = jnp.clip(code - mv_base, 0, n_mv - 1)

            def chunk_min(c, best, c0, floor):
                ids = jax.lax.dynamic_slice(cb.mv_perm,
                                            ((c0 + c) * lf_,), (lf_,))
                pad = ids < 0
                ids_s = jnp.maximum(ids, 0)
                sub = _dc.replace(
                    tris_d, v0=tris_d.v0[ids_s], e1=tris_d.e1[ids_s],
                    e2=tris_d.e2[ids_s], normal=tris_d.normal[ids_s],
                    material=tris_d.material[ids_s],
                    volume=tris_d.volume[ids_s])
                t_raw, geo = triangle_ts_raw(sub, o_d, d_d)  # (R, lf)
                valid = geo & ~pad[None, :] & (t_raw >= floor[:, None])
                ti = jnp.where(valid, t_raw, INF)
                return jnp.minimum(best, ti.min(axis=1))

            for v, (c0, nc) in enumerate(cb.mv_spans):
                inf0 = jnp.full(o.shape[:1], INF, jnp.float32)
                t1 = jax.lax.fori_loop(
                    0, nc, lambda c, b: chunk_min(c, b, c0, -inf0), inf0)
                t2 = jax.lax.fori_loop(
                    0, nc, lambda c, b: chunk_min(c, b, c0, t1 + T_MIN),
                    inf0)
                del t2  # the recorded winner implies a valid window
                h1 = jnp.maximum(jnp.maximum(t1, T_MIN), 0.0)
                nid = scene.mesh_volumes.neg_inv_density[v]
                uu = u_vol[:, n_vol + v]
                hit_dist = nid * jnp.log(jnp.maximum(uu, 1e-37))
                t_v = h1 + hit_dist / ray_len
                t_v = jnp.where(jnp.isfinite(t_v), t_v, 1.0)
                sel = is_mv & (vsel == v)
                t_hit = jnp.where(sel, t_v, t_hit)
                mid = jnp.where(sel, scene.mesh_volumes.material[v], mid)

        t_safe = jnp.where(hit, t_hit, 1.0)
        point = o + t_safe[:, None] * d
        if sph_span:
            sc = scene.spheres.center[sidx]
            sr = scene.spheres.radius[sidx]
            n_s = (point - sc) / sr[:, None]
            n_out = jnp.where(is_sph[:, None], n_s, n_out)
        if vol_span:
            # volume dummy normal (1, 0, 0) (lib/volume.rs:66-72)
            n_out = jnp.where(is_vol[:, None],
                              jnp.array([1.0, 0.0, 0.0], jnp.float32),
                              n_out)
        if n_mv:
            n_out = jnp.where(is_mv[:, None],
                              jnp.array([1.0, 0.0, 0.0], jnp.float32),
                              n_out)
        if tri_span:
            n_out = jnp.where(is_tri[:, None], tris.normal[tidx], n_out)

        # background on miss (lib/core/render.rs:57); for SKYMAP the
        # equirect gather is differentiable w.r.t. the sky texels
        missed = alive & (code < 0)
        bg_rad = scene.background.sample(d)
        if env is not None:
            # MIS weight of the BSDF-sampled env hit (integrator.py
            # env_is: rays whose last scatter was diffuse share the env's
            # measure with the NEE sample; specular/primary keep w = 1)
            dn = vec.normalize(jax.lax.stop_gradient(d))
            p_env = scene.background.pdf(dn)
            w_b = jnp.where(mis_pdf > 0.0,
                            mis_pdf / (mis_pdf + p_env), 1.0)
            bg_rad = bg_rad * w_b[..., None]
        rad = rad + jnp.where(missed[:, None], thr * bg_rad, 0.0)

        # front-face flip + branchless lobes (same uniforms as the kernel);
        # recorded winners carry their RAW material id — single-level
        # mixes re-resolve with the same level-0 coin the kernel blended
        # with, so the replayed lobe is exactly the blended one.  The
        # front flag and the metal/dielectric branch choices come FROM THE
        # RECORD (the kernel's own decisions), not from recomparison.
        front = jnp.where(hit, front_rec == 1, vec.dot(d, n_out) < 0.0)
        n = jnp.where(front[:, None], n_out, -n_out)
        mid = shade_ops.resolve_mix(scene.materials, mid,
                                    u[:, :n_shade])
        atten, new_dir, scatters = shade_ops.scatter(
            scene.materials, mid, d, n, front, u[:, :n_shade], clay=clay,
            forced={"metal_ok": m_ok_rec, "dielectric_reflect": refl_rec})

        terminal = hit & ~scatters
        rad = rad + jnp.where(terminal[:, None], thr * atten, 0.0)
        cont = hit & scatters
        if env is not None:
            # next-event estimation toward a luminance-sampled sky
            # direction — op-for-op the integrator.py env_is block
            from ..models import materials as M
            from ..models.backgrounds import sample_skymap_direction
            from ..render.integrator import nee_stream
            from ..utils.types import PI

            kind = scene.materials.kind[mid]
            diffuse = cont & (kind == M.LAMBERTIAN)
            un = rng.ray_uniforms(key, ray_ids,
                                  nee_stream(b, max_depth), 2 + n_vol)
            d_l, p_l = sample_skymap_direction(
                scene.background, un[:, 0], un[:, 1])
            d_l = jax.lax.stop_gradient(d_l)
            p_l = jax.lax.stop_gradient(p_l)
            cos_l = jnp.maximum(vec.dot(n, d_l), 0.0)
            occluded = env["occlude"](
                jax.lax.stop_gradient(point), d_l, b)
            p_b = cos_l / PI
            w_l = p_l / (p_l + p_b)
            L = scene.background.sample(d_l)
            albedo = scene.materials.albedo[mid]
            nee = (
                thr * albedo * L
                * (cos_l / PI / jnp.maximum(p_l, 1e-12) * w_l)[..., None]
            )
            take = diffuse & ~occluded & (cos_l > 0.0)
            rad = rad + jnp.where(take[:, None], nee, 0.0)

            ndn = vec.normalize(jax.lax.stop_gradient(new_dir))
            cos_n = jnp.maximum(vec.dot(n, ndn), 0.0)
            mis_pdf = jax.lax.stop_gradient(
                jnp.where(diffuse, cos_n / PI, 0.0))
        thr = jnp.where(cont[:, None], thr * atten, thr)
        o = jnp.where(cont[:, None], point, o)
        d = jnp.where(cont[:, None], new_dir, d)
        alive = cont
    return rad
