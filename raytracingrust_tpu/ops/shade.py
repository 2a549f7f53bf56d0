"""Branchless material shading.

The reference's ``Material::scatter`` dynamic dispatch (lib/core/render.rs:40
-> lib/materials.rs) becomes masked evaluation of every lobe with a one-hot
blend over the material kind id — the wavefront stays fully dense on the VPU
(SURVEY.md section 2.6, the expert-parallel analog).  Semantics are lifted
lobe-by-lobe from lib/materials.rs and lib/volume.rs:75-88:

  * Lambertian — dir = normal + unit-sphere-surface sample, degenerate
    fallback to the normal, always scatters, attenuation = albedo.
  * Metal — dir = normalize(reflect(d_in, n)) + fuzz * sphere sample;
    absorbs (black, no scatter) when the fuzzed dir leaves the hemisphere.
  * Dielectric — Schlick vs U coin flip + total-internal-reflection test;
    attenuation = white.
  * Emission — attenuation = premultiplied color, never scatters.
  * Isotropic — dir = unit-sphere-VOLUME sample, attenuation = color.
  * Mix — resolved to a concrete material id BEFORE lobe evaluation with one
    fresh uniform per nesting level (lib/materials.rs:149-156).

Uniform budget per bounce and ray (see integrator): MAX_MIX_DEPTH for mix
resolution, 2 for the direction sample, 1 for the dielectric coin, 1 for the
isotropic radius.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..models import materials as M
from ..utils import rng, vec

# uniform layout within a bounce's draw block
N_SHADE_UNIFORMS = M.MAX_MIX_DEPTH + 4


def resolve_mix(table: M.MaterialTable, mat_id, u_mix):
    """Collapse (possibly nested) MixMaterial ids to concrete material ids.

    One masked gather step per nesting level; non-mix rows point at
    themselves so resolved ids are fixed points.  ``u_mix`` is
    (R, MAX_MIX_DEPTH); the reference draws a fresh uniform per nested
    scatter call (lib/materials.rs:151).
    """
    for level in range(M.MAX_MIX_DEPTH):
        is_mix = table.kind[mat_id] == M.MIX
        pick_first = u_mix[:, level] >= table.mix_factor[mat_id]
        child = jnp.where(
            pick_first, table.mix_first[mat_id], table.mix_second[mat_id]
        )
        mat_id = jnp.where(is_mix, child, mat_id)
    return mat_id


def schlick(cosine, idx):
    """Dielectric::reflectance (lib/materials.rs:103-108)."""
    r0 = (1.0 - idx) / (1.0 + idx)
    r0 = r0 * r0
    return r0 + (1.0 - r0) * (1.0 - cosine) ** 5


def scatter(table: M.MaterialTable, mat_id, d_in, normal, front_face, u,
            clay: bool = False):
    """Evaluate all lobes, select by material kind.

    Args:
      mat_id: (R,) resolved material ids (post resolve_mix).
      d_in: (R, 3) incoming ray direction (unnormalized, as in reference).
      normal: (R, 3) front-face-flipped hit normal.
      front_face: (R,) bool.
      u: (R, >= N_SHADE_UNIFORMS) uniforms; columns [MAX_MIX_DEPTH:] are
         (dir1, dir2, coin, radius).
      clay: Clay render mode — force Lambertian(0.8 gray)
            (lib/core/render.rs:41).

    Returns (attenuation (R,3), new_dir (R,3), does_scatter (R,)).
    """
    k = M.MAX_MIX_DEPTH
    u1, u2, u_coin, u_r = u[:, k], u[:, k + 1], u[:, k + 2], u[:, k + 3]
    kind = table.kind[mat_id]
    albedo = table.albedo[mat_id]
    sphere_dir = rng.unit_sphere_surface(u1, u2)  # shared across lobes: only
    # one lobe is selected per ray and selection is independent of the draw

    # Lambertian (lib/materials.rs:31-42)
    lam_dir = normal + sphere_dir
    lam_dir = jnp.where(
        vec.near_zero(lam_dir)[..., None], normal, lam_dir
    )

    # Metal (lib/materials.rs:58-70)
    reflected = vec.normalize(vec.reflect(d_in, normal))
    metal_dir = reflected + table.fuzz[mat_id][..., None] * sphere_dir
    metal_ok = vec.dot(metal_dir, normal) > 0.0

    # Dielectric (lib/materials.rs:113-138)
    ir = table.ir[mat_id]
    ratio = jnp.where(front_face, 1.0 / ir, ir)
    ud = vec.normalize(d_in)
    cos_theta = jnp.minimum(vec.dot(normal, -ud), 1.0)
    # sin_theta feeds only the discrete TIR comparison — detach it so the
    # sqrt-at-0 (normal incidence) infinite derivative never enters AD
    sin_theta = jax.lax.stop_gradient(
        jnp.sqrt(jnp.maximum(0.0, 1.0 - cos_theta * cos_theta))
    )
    cannot_refract = ratio * sin_theta > 1.0
    choose_reflect = cannot_refract | (schlick(cos_theta, ratio) > u_coin)
    diel_dir = jnp.where(
        choose_reflect[..., None],
        vec.reflect(ud, normal),
        vec.refract(ud, normal, ratio),
    )

    # Isotropic (lib/volume.rs:75-88)
    iso_dir = sphere_dir * jnp.cbrt(u_r)[..., None]

    if clay:
        # Clay mode: every hit shades as Lambertian(0.8,0.8,0.8)
        return (
            jnp.full_like(albedo, 0.8),
            lam_dir,
            jnp.ones(kind.shape, bool),
        )

    white = jnp.ones_like(albedo)
    black = jnp.zeros_like(albedo)

    kindc = kind[..., None]
    atten = jnp.select(
        [kindc == M.LAMBERTIAN, kindc == M.METAL, kindc == M.DIELECTRIC,
         kindc == M.EMISSION, kindc == M.ISOTROPIC],
        [albedo, jnp.where(metal_ok[..., None], albedo, black), white,
         table.emission[mat_id], albedo],
        default=black,
    )
    new_dir = jnp.select(
        [kind[..., None] == M.LAMBERTIAN, kind[..., None] == M.METAL,
         kind[..., None] == M.DIELECTRIC, kind[..., None] == M.ISOTROPIC],
        [lam_dir, metal_dir, diel_dir, iso_dir],
        default=normal,
    )
    does_scatter = jnp.select(
        [kind == M.EMISSION, kind == M.METAL],
        [jnp.zeros(kind.shape, bool), metal_ok],
        default=jnp.ones(kind.shape, bool),
    )
    return atten, new_dir, does_scatter
