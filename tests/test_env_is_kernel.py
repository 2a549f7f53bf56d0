"""HDRI importance sampling on the Pallas path (r4, BASELINE config #4).

The hybrid: the record kernel drives the bounce walk (the naive walk
visits exactly the hits the MIS estimator shades — NEE only adds
contributions, it never changes the path), NEE shadow rays run the
intersect-only occlusion kernel, and a differentiable XLA replay
assembles the one-sample-MIS estimator op-for-op with
render/integrator.py's env_is blocks.  Ground truth: the XLA engine's
estimator (flip-tolerant — the engines' f32 scatter math ulp-differs on
borderline paths).
"""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from raytracingrust_tpu import (  # noqa: F401
    Background,
    Camera,
    Lambertian,
    Metal,
    RenderSettings,
    SceneBuilder,
)
from raytracingrust_tpu.ops import pallas_megakernel as PK
from raytracingrust_tpu.render.render import render_linear


def sun_sky(h=16, w=32):
    img = np.full((h, w, 3), 0.05, np.float32)
    img[2:4, 5:8] = 25.0  # small bright sun: IS matters here
    return img


def env_scene(spp=8, depth=4, with_bvh=True):
    b = SceneBuilder()
    b.camera = Camera.create((0, 1.2, 4), (0, 0.6, 0), (0, 1, 0),
                             55.0, 1.0)
    b.settings = RenderSettings(samples_per_pixel=spp, max_ray_depth=depth,
                                env_importance_sampling=True)
    lam = b.add_material(Lambertian((0.7, 0.6, 0.5)))
    met = b.add_material(Metal((0.9, 0.9, 0.9), 0.1))
    b.add_sphere((0, -100, 0), 100.0, lam)
    b.add_sphere((0.8, 0.5, 0), 0.5, met)
    b.add_sphere((-0.8, 0.4, 0), 0.4, lam)
    b.background = Background.skymap_from_array(sun_sky())
    return b.build(with_bvh=with_bvh)


def test_env_is_hybrid_matches_xla():
    scene = env_scene()
    assert PK.supports_bvh(scene) and PK._env_is_active(scene)
    xla = np.asarray(render_linear(scene, 10, 10, seed=0, engine="xla"))
    hyb = np.asarray(render_linear(scene, 10, 10, seed=0,
                                   engine="pallas_bvh"))
    mismatched = (~np.isclose(xla, hyb, atol=1e-4, rtol=1e-3)).mean()
    assert mismatched <= 0.1, f"{mismatched:.4f} channels differ"
    assert np.abs(xla - hyb).mean() < 1e-2


def test_env_is_hybrid_beats_naive_variance():
    """The whole point of IS: against a small bright sun, the MIS
    estimator's variance must be well below the naive estimator's —
    through the HYBRID path (same check test_env_sampling.py makes for
    the XLA engine)."""
    scene = env_scene(spp=4, depth=3)
    naive = dataclasses.replace(
        scene, settings=dataclasses.replace(
            scene.settings, env_importance_sampling=False))

    def var_of(s, engine, n=6):
        frames = [np.asarray(render_linear(s, 8, 8, seed=i,
                                           engine=engine))
                  for i in range(n)]
        return np.stack(frames).var(axis=0).mean()

    v_is = var_of(scene, "pallas_bvh")
    v_naive = var_of(naive, "pallas_bvh")
    assert v_is < v_naive * 0.55, (v_is, v_naive)


def test_env_is_hybrid_grads_match_xla():
    """Albedo AND sky-texel gradients through the hybrid (replay is the
    differentiable primal; record + occlusion kernels are detached)."""
    scene = env_scene(spp=2, depth=3)

    def loss(albedo, sky, engine):
        mats = dataclasses.replace(
            scene.materials,
            albedo=scene.materials.albedo.at[0].set(albedo))
        bg = dataclasses.replace(scene.background, image=sky)
        s2 = dataclasses.replace(scene, materials=mats, background=bg)
        return jnp.sum(render_linear(s2, 8, 8, seed=0, engine=engine)
                       ** 2)

    a0 = jnp.array([0.7, 0.6, 0.5], jnp.float32)
    sky0 = jnp.asarray(sun_sky())
    g_h = jax.grad(loss, argnums=(0, 1))(a0, sky0, "pallas_bvh")
    g_x = jax.grad(loss, argnums=(0, 1))(a0, sky0, "xla")
    # albedo: dense, flip-tolerant per-element
    h0, x0 = np.asarray(g_h[0]), np.asarray(g_x[0])
    assert np.abs(h0).sum() > 0
    rel = np.abs(h0 - x0) / (np.abs(x0) + 1e-2 * np.abs(x0).max())
    assert rel.max() < 0.1, f"albedo rel err {rel.max():.3f}"
    # sky texels: sparse per-texel deposits — a single flipped path moves
    # its whole cotangent to a different texel, so compare in aggregate
    h1, x1 = np.asarray(g_h[1]), np.asarray(g_x[1])
    assert np.abs(h1).sum() > 0
    l2 = np.linalg.norm(h1 - x1) / np.linalg.norm(x1)
    assert l2 < 0.15, f"sky grad l2 rel err {l2:.3f}"


def test_occlusion_kernel_matches_closest_hit():
    """The shadow kernel must agree with the XLA closest_hit the
    integrator uses (any-hit beyond T_MIN)."""
    from raytracingrust_tpu.render.integrator import closest_hit, nee_stream
    from raytracingrust_tpu.utils import rng

    scene = env_scene(spp=1, depth=2)
    r = 64
    key = rng.base_key(3)
    ids = jnp.arange(r, dtype=jnp.int32)
    k1, k2 = jax.random.split(jax.random.PRNGKey(7))
    o = jax.random.uniform(k1, (r, 3), minval=-2.0, maxval=2.0)
    d = jax.random.normal(k2, (r, 3))
    stream = nee_stream(0, scene.settings.max_ray_depth)
    want = closest_hit(scene, o, d,
                       jnp.zeros((r, 0), jnp.float32)).hit
    got = PK.occlusion_bvh(scene, o, d, stream,
                           key.astype(jnp.int32), ids, interpret=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_occlusion_kernel_volume_free_flight():
    """Volume spheres occlude STOCHASTICALLY: the kernel derives the
    same NEE-stream free-flight uniform columns (2..) in-kernel that the
    XLA integrator hands closest_hit (un[:, 2:]) — bitwise-equal
    occlusion decisions per ray."""
    from raytracingrust_tpu import Isotropic
    from raytracingrust_tpu.render.integrator import closest_hit, nee_stream
    from raytracingrust_tpu.utils import rng

    b = SceneBuilder()
    b.camera = Camera.create((0, 1, 4), (0, 0.5, 0), (0, 1, 0),
                             55.0, 1.0)
    b.settings = RenderSettings(samples_per_pixel=1, max_ray_depth=3,
                                env_importance_sampling=True)
    iso = b.add_material(Isotropic((0.6, 0.6, 0.6)))
    lam = b.add_material(Lambertian((0.7, 0.6, 0.5)))
    vi = b.add_sphere((0, 0.5, 0), 1.0, iso)
    b.add_volume(vi, 0.6)  # low density: many rays fly through
    b.add_sphere((2, 0.5, 0), 0.4, lam)
    b.background = Background.skymap_from_array(sun_sky())
    scene = b.build(with_bvh=True)
    assert scene.spheres.num_volumes == 1

    r = 128
    key = rng.base_key(5)
    ids = jnp.arange(r, dtype=jnp.int32)
    k1, k2 = jax.random.split(jax.random.PRNGKey(9))
    o = jax.random.uniform(k1, (r, 3), minval=-2.0, maxval=2.0)
    d = jax.random.normal(k2, (r, 3))
    stream = nee_stream(1, scene.settings.max_ray_depth)
    un = rng.ray_uniforms(key, ids, stream, 2 + 1)
    want = closest_hit(scene, o, d, un[:, 2:]).hit
    got = PK.occlusion_bvh(scene, o, d, stream,
                           key.astype(jnp.int32), ids, interpret=True)
    # both occluded and unoccluded rays must exist, else the test is vacuous
    assert np.asarray(want).any() and not np.asarray(want).all()
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_env_is_hybrid_tiling():
    """A wide HDRI shrinks the replay tile (the (tile_rays, sky_width)
    CDF intermediates are memory-bounded); a multi-tile render must
    agree with XLA exactly like the single-tile path."""
    b = SceneBuilder()
    b.camera = Camera.create((0, 1.2, 4), (0, 0.6, 0), (0, 1, 0),
                             55.0, 1.0)
    b.settings = RenderSettings(samples_per_pixel=4, max_ray_depth=3,
                                env_importance_sampling=True)
    lam = b.add_material(Lambertian((0.7, 0.6, 0.5)))
    b.add_sphere((0, -100, 0), 100.0, lam)
    b.add_sphere((0, 0.5, 0), 0.5, lam)
    wide = np.full((4, 8192, 3), 0.05, np.float32)
    wide[1, 100:140] = 40.0
    b.background = Background.skymap_from_array(wide)
    scene = b.build(with_bvh=True)
    # 24x24 spp4 = 2304 rays; tile_rays = 2^24/8192 = 2048 -> 2+ tiles
    xla = np.asarray(render_linear(scene, 24, 24, seed=0, engine="xla"))
    hyb = np.asarray(render_linear(scene, 24, 24, seed=0,
                                   engine="pallas_bvh"))
    mismatched = (~np.isclose(xla, hyb, atol=1e-4, rtol=1e-3)).mean()
    assert mismatched <= 0.1, f"{mismatched:.4f} channels differ"


def test_env_is_mesh_volume_combo_fails_loudly():
    """supports_bvh refuses env-IS + mesh volumes (the occlusion kernel
    has no stochastic fog model); an explicit engine override must raise,
    never silently drop the fog."""
    from raytracingrust_tpu import Isotropic
    from raytracingrust_tpu.models.mesh import Mesh

    c = np.zeros(3, np.float32)
    v = np.array([[x, y, z] for x in (-1, 1) for y in (-1, 1)
                  for z in (-1, 1)], np.float32) + c
    f = np.array([[0, 1, 3], [0, 3, 2], [4, 6, 7], [4, 7, 5],
                  [0, 4, 5], [0, 5, 1], [2, 3, 7], [2, 7, 6],
                  [0, 2, 6], [0, 6, 4], [1, 5, 7], [1, 7, 3]], np.int32)
    b = SceneBuilder()
    b.settings = RenderSettings(samples_per_pixel=2, max_ray_depth=3,
                                env_importance_sampling=True)
    iso = b.add_material(Isotropic((0.5, 0.5, 0.5)))
    mi = b.add_mesh(Mesh.from_buffers(v, v, f, iso))
    b.add_volume(mi, 1.0)
    b.background = Background.skymap_from_array(sun_sky())
    scene = b.build(with_bvh=True)
    assert not PK.supports_bvh(scene)
    with pytest.raises(ValueError, match="mesh-bounded volumes"):
        PK._bvh_env_radiance(scene, jnp.arange(4, dtype=jnp.int32), 2, 2,
                             jnp.zeros(2, jnp.int32), interpret=True)


def test_env_is_hybrid_triangles_match_xla():
    """Triangle scenes through the hybrid: the record walk, the
    occlusion kernel's tri-tree pass, and the replay's recorded-triangle
    shading all under NEE."""
    from raytracingrust_tpu.models.mesh import Mesh

    b = SceneBuilder()
    b.camera = Camera.create((0, 2.5, 4), (0, 0, 0), (0, 1, 0),
                             55.0, 1.0)
    b.settings = RenderSettings(samples_per_pixel=4, max_ray_depth=3,
                                env_importance_sampling=True)
    lam = b.add_material(Lambertian((0.6, 0.5, 0.3)))
    n_side = 5
    xs = np.linspace(-2, 2, n_side + 1, dtype=np.float32)
    gx, gz = np.meshgrid(xs, xs, indexing="ij")
    gy = 0.3 * np.sin(gx * 2.1) * np.cos(gz * 1.7)
    verts = np.stack([gx, gy, gz], axis=-1).reshape(-1, 3).astype(np.float32)
    faces = []
    for i in range(n_side):
        for j in range(n_side):
            a = i * (n_side + 1) + j
            bq = a + 1
            c = a + (n_side + 1)
            dd = c + 1
            faces.append([a, bq, c])
            faces.append([bq, dd, c])
    b.add_mesh(Mesh.from_buffers(verts, verts,
                                 np.asarray(faces, np.int32), lam))
    b.add_sphere((0.6, 1.2, 0.0), 0.4, lam)
    b.background = Background.skymap_from_array(sun_sky())
    scene = b.build(with_bvh=True)
    assert PK.supports_bvh(scene) and len(scene.triangles) == 50

    xla = np.asarray(render_linear(scene, 10, 10, seed=0, engine="xla"))
    hyb = np.asarray(render_linear(scene, 10, 10, seed=0,
                                   engine="pallas_bvh"))
    mismatched = (~np.isclose(xla, hyb, atol=1e-4, rtol=1e-3)).mean()
    assert mismatched <= 0.1, f"{mismatched:.4f} channels differ"
    assert np.abs(xla - hyb).mean() < 1e-2


def test_env_is_hybrid_multihost_bitwise():
    """The hybrid composes with the distributed layer: sharded over an
    8-device mesh it is bitwise identical to the single-device render
    (global ray ids key every draw, incl. the NEE stream and the
    occlusion kernel's in-kernel volume uniforms)."""
    from raytracingrust_tpu.parallel import distributed as dist

    s = env_scene(spp=4, depth=3)
    ref = np.asarray(render_linear(s, 11, 5, seed=3,
                                   engine="pallas_bvh"))
    out = dist.render_multihost(s, 11, 5, seed=3, engine="pallas_bvh")
    np.testing.assert_array_equal(out, ref)
