"""Mix materials on the packet-traversal BVH kernel (VERDICT r3 #5).

Single-level MixMaterial (lib/materials.rs:141-157) on the chunk-leaf
kernel: every chunk tree carries an S2 matrix (leaf-B shading rows + mix
factor in the _BS_ layout) and the leaf merge blends the S and S2 one-hot
fetches with the bounce's mix coin BEFORE the winner rides the carry.
Ground truth mirrors test_pallas_bvh.py: bitwise vs the brute kernel on
scenes both support, flip-tolerant vs XLA beyond the brute limits, and
gradients through record+replay vs the XLA reverse path.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from raytracingrust_tpu import (
    Camera,
    Dielectric,
    Emission,
    Lambertian,
    Metal,
    MixMaterial,
    RenderSettings,
    SceneBuilder,
)
from raytracingrust_tpu.ops import pallas_megakernel as PK
from raytracingrust_tpu.render.render import render_linear


def mix_grid_builder(n=4, depth=4, spp=2, spacing=1.4, radius=0.5):
    b = SceneBuilder()
    b.camera = Camera.create((6, 5, 8), (0, 0, 0), (0, 1, 0), 50.0, 1.0)
    b.settings = RenderSettings(samples_per_pixel=spp, max_ray_depth=depth)
    mats = [
        b.add_material(Lambertian((0.7, 0.3, 0.2))),
        b.add_material(MixMaterial(Lambertian((0.2, 0.6, 0.9)),
                                   Metal((0.9, 0.9, 0.9), 0.05), 0.4)),
        b.add_material(Emission((2.0, 1.5, 1.0))),
        b.add_material(MixMaterial(Dielectric(1.5),
                                   Emission((1.5, 0.5, 0.2)), 0.7)),
    ]
    rs = np.random.RandomState(0)
    for i in range(n):
        for j in range(n):
            for k in range(n):
                b.add_sphere(
                    ((i - n / 2) * spacing, (j - n / 2) * spacing,
                     (k - n / 2) * spacing), radius, mats[rs.randint(4)])
    return b


def mix_mesh_builder(n_side=5, depth=3, spp=1):
    """Triangle sheet whose material is a mix + a mix sphere."""
    from raytracingrust_tpu.models.mesh import Mesh

    b = SceneBuilder()
    b.camera = Camera.create((0, 2.5, 4), (0, 0, 0), (0, 1, 0), 55.0, 1.0)
    b.settings = RenderSettings(samples_per_pixel=spp, max_ray_depth=depth)
    mm = b.add_material(MixMaterial(Lambertian((0.6, 0.5, 0.3)),
                                    Metal((0.9, 0.85, 0.8), 0.02), 0.35))
    ms = b.add_material(MixMaterial(Emission((2.0, 1.8, 1.4)),
                                    Lambertian((0.2, 0.3, 0.8)), 0.5))
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
            d = c + 1
            faces.append([a, bq, c])
            faces.append([bq, d, c])
    b.add_mesh(Mesh.from_buffers(verts, verts,
                                 np.asarray(faces, np.int32), mm))
    b.add_sphere((0.6, 1.2, 0.0), 0.4, ms)
    return b


def test_supports_bvh_admits_single_level_mix():
    s = mix_grid_builder(n=6).build(with_bvh=True)  # 216 > brute's 128
    assert not PK.supports(s)
    assert PK.supports_bvh(s)
    # single-level keeps the S2 blend; NESTED mixes are admitted since r5
    # via the shade-stage resolution chain (tests/test_pallas_bvh_mixn.py)
    assert PK._mixn_cfg(s) == (True, 0, 0)
    b = mix_grid_builder(n=2)
    b.add_material(MixMaterial(
        MixMaterial(Lambertian((0.5, 0.5, 0.5)),
                    Metal((0.9, 0.9, 0.9), 0.0), 0.5),
        Lambertian((0.1, 0.1, 0.1)), 0.5))
    b.add_sphere((0, 3, 0), 0.4, 4)
    s2 = b.build(with_bvh=True)
    assert PK.supports_bvh(s2)
    mix, d_mix, m_pad = PK._mixn_cfg(s2)
    assert not mix and d_mix == 2 and m_pad == 128
    # the brute kernel still takes single-level only
    assert PK._mix_in_kernel_ok(s) and not PK._mix_in_kernel_ok(s2)


def test_mix_bvh_bitwise_vs_brute_kernel():
    """Scenes BOTH kernels support: the leaf-merge blend must reproduce
    the brute kernel's baked-two-leaves blend exactly (shared RNG, shared
    shading; only borderline root-rule flips may differ)."""
    scene = mix_grid_builder(n=3, depth=3).build(with_bvh=True)
    assert PK.supports(scene) and PK.supports_bvh(scene)
    brute = np.asarray(render_linear(scene, 12, 12, seed=0,
                                     engine="pallas"))
    bvh = np.asarray(render_linear(scene, 12, 12, seed=0,
                                   engine="pallas_bvh"))
    neq = (brute != bvh).any(-1)
    assert neq.mean() <= 3 / (12 * 12), f"{neq.sum()} pixels differ"
    np.testing.assert_array_equal(brute[~neq], bvh[~neq])


def test_mix_bvh_matches_xla_beyond_brute_limit():
    """216-sphere mix grid — the scene class VERDICT r3 #5 named (one
    doubling past the brute kernel's 128-sphere cliff)."""
    scene = mix_grid_builder(n=6, depth=3, spp=1).build(with_bvh=True)
    assert not PK.supports(scene) and PK.supports_bvh(scene)
    xla = np.asarray(render_linear(scene, 10, 10, seed=0, engine="xla"))
    bvh = np.asarray(render_linear(scene, 10, 10, seed=0,
                                   engine="pallas_bvh"))
    mismatched = (~np.isclose(xla, bvh, atol=1e-4, rtol=1e-3)).mean()
    assert mismatched <= 0.08, f"{mismatched:.4f} channels differ"
    assert np.abs(xla - bvh).mean() < 4e-2


def test_mix_bvh_triangles_match_xla():
    scene = mix_mesh_builder().build(with_bvh=True)
    assert PK.supports_bvh(scene) and scene.materials.has_mix
    xla = np.asarray(render_linear(scene, 12, 12, seed=0, engine="xla"))
    bvh = np.asarray(render_linear(scene, 12, 12, seed=0,
                                   engine="pallas_bvh"))
    mismatched = (~np.isclose(xla, bvh, atol=1e-4, rtol=1e-3)).mean()
    assert mismatched <= 0.08, f"{mismatched:.4f} channels differ"


def test_mix_bvh_grad_fd():
    """Fits of mix scenes through record+replay: the replay re-resolves
    each recorded winner's mix with the same level-0 coin the kernel
    blended with, so AD of the fixed-seed loss must match central finite
    differences — including the albedo of a material reachable ONLY
    through a mix leaf."""
    import dataclasses

    scene = mix_grid_builder(n=3, depth=3, spp=1).build(with_bvh=True)
    assert scene.materials.has_mix and PK.supports_bvh(scene)
    # table row of mix #1's leaf-A child (Lambertian (0.2, 0.6, 0.9))
    kind = np.asarray(scene.materials.kind)
    first = np.asarray(scene.materials.mix_first)
    mix_rows = np.nonzero(kind == 5)[0]
    leaf = int(first[mix_rows[0]])
    assert kind[leaf] == 0  # lambertian leaf

    def loss(albedo):
        mats = dataclasses.replace(
            scene.materials,
            albedo=scene.materials.albedo.at[leaf].set(albedo))
        s2 = dataclasses.replace(scene, materials=mats)
        img = render_linear(s2, 10, 10, seed=0, engine="pallas_bvh")
        return jnp.sum(img ** 2)

    a0 = jnp.array([0.2, 0.6, 0.9], jnp.float32)
    g = jax.jit(jax.grad(loss))(a0)
    loss_j = jax.jit(loss)
    checked = 0
    for i in range(3):
        eps = 1e-3
        want = (float(loss_j(a0.at[i].add(eps)))
                - float(loss_j(a0.at[i].add(-eps)))) / (2 * eps)
        got = float(g[i])
        np.testing.assert_allclose(got, want, rtol=3e-2, atol=5e-3)
        checked += abs(got) > 1e-6
    assert checked >= 2, "mix-leaf albedo gradient should be live"


def test_mix_bvh_generations_bitwise():
    """Generation scheduling is pure scheduling for mix scenes too: the
    mix coin is keyed by global ray id + bounce stream, so the G=4
    schedule must be bitwise identical to G=1."""
    from raytracingrust_tpu.utils import rng as rng_mod  # noqa: F401

    scene = mix_grid_builder(n=3, depth=8, spp=2).build(with_bvh=True)
    assert PK.supports_bvh(scene) and scene.materials.has_mix
    w = h = 8
    pixel_ids = jnp.arange(w * h, dtype=jnp.int32)
    iparams = PK.seed_words(0)

    out1 = np.asarray(PK.pixel_radiance_pallas_bvh(
        scene, pixel_ids, w, h, iparams, interpret=True, gens=1))
    out4 = np.asarray(PK.pixel_radiance_pallas_bvh(
        scene, pixel_ids, w, h, iparams, interpret=True, gens=4))
    np.testing.assert_array_equal(out1, out4)
