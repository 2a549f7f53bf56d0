"""Counter-based, shard-invariant random number generation.

The reference uses unseeded per-OS-thread ``thread_rng`` everywhere
(lib/core/render.rs:80, lib/materials.rs:127,151, lib/volume.rs:57,
lib/utils/sample.rs:59-79), so its renders are not reproducible (SURVEY.md
quirk Q10).  Here every random draw is a pure function of
``(seed, ray_id, bounce, stream)`` via threefry, so renders are bit-identical
across reruns AND across device-mesh layouts: a ray's randomness depends only
on its global id, never on which chip traced it.

Distribution parity with the reference samplers (lib/utils/sample.rs):
  * ``sample_unit_sphere_surface`` — rejection-sample a cube, keep |v|<=1,
    normalize.  Uniform on S^2; we generate it directly from (z, phi).
  * ``sample_unit_sphere_volume`` — rejection-sample, keep |v|<=1.  Uniform
    in the ball; we generate it as surface * r where r = U^(1/3).
The distributions are identical; the draws are not bitwise identical to Rust
(impossible anyway given the unseeded reference RNG).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .types import PI


def base_key(seed: int):
    return jax.random.key(seed)


def ray_keys(key, ray_ids):
    """One derived key per ray, keyed by the ray's *global* id.

    ``ray_ids`` is ``(R,)`` int32 (global pixel*spp + sample index), so the
    stream is invariant to batching/tiling/sharding layout.
    """
    return jax.vmap(jax.random.fold_in, in_axes=(None, 0))(key, ray_ids)


def bounce_uniforms(keys, bounce, n: int):
    """(R, n) independent U[0,1) draws for one bounce.

    ``keys``: per-ray keys from :func:`ray_keys`; ``bounce`` may be traced.
    """
    def draw(k):
        return jax.random.uniform(jax.random.fold_in(k, bounce), (n,))

    return jax.vmap(draw)(keys)


def stream_uniform(keys, stream: int, shape=()):
    """Per-ray U[0,1) draws on a named stream (e.g. pixel jitter)."""
    def draw(k):
        return jax.random.uniform(jax.random.fold_in(k, stream), shape)

    return jax.vmap(draw)(keys)


def unit_sphere_surface(u1, u2):
    """Uniform direction on the unit sphere from two U[0,1) draws.

    Same distribution as ``sample_unit_sphere_surface``
    (lib/utils/sample.rs:71-79) without the rejection loop (data-dependent
    loops do not vectorize on TPU lanes).
    """
    z = 1.0 - 2.0 * u1
    r = jnp.sqrt(jnp.maximum(0.0, 1.0 - z * z))
    phi = (2.0 * PI) * u2
    return jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi), z], axis=-1)


def unit_sphere_volume(u1, u2, u3):
    """Uniform point in the unit ball (lib/utils/sample.rs:40-57 equivalent)."""
    d = unit_sphere_surface(u1, u2)
    r = jnp.cbrt(u3)
    return d * r[..., None]
