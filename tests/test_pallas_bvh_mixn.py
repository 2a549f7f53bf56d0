"""NESTED mix materials on the packet-traversal BVH kernel (VERDICT r4 #6).

The reference nests ``Box<dyn Material>`` arbitrarily
(lib/materials.rs:141-157); XLA resolves the DAG with one masked-lookup
round per level (ops/shade.py resolve_mix).  Since r5 the packet kernel
resolves it too: the traversal carry holds the winner's RAW material id
(row _BS_AL of the chunk S matrices) and the shade stage runs ``d_mix``
one-hot lookup rounds against a (16, m_pad) per-material VMEM table
(_mixn_resolve) — same coins, same ``u >= factor`` pick, so leaves are
bitwise-equal to the XLA engine's.  Mix + MESH-VOLUME combos (r4 missing
#4) ride the same scheme: the mv fparams record carries the raw delegated
id (slot 13), so a mix delegated material (lib/volume.rs:25-31 boundaries
carry ANY material) resolves like any surface winner.

Ground truth mirrors test_pallas_bvh_mix.py: bitwise-modulo-root-flips vs
XLA, record+replay gradients vs central finite differences, and
generation-scheduling invariance.
"""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from raytracingrust_tpu import (
    Camera,
    Dielectric,
    Emission,
    Isotropic,
    Lambertian,
    Metal,
    MixMaterial,
    RenderSettings,
    SceneBuilder,
)
from raytracingrust_tpu.models.mesh import Mesh
from raytracingrust_tpu.ops import pallas_megakernel as PK
from raytracingrust_tpu.render.render import render_linear


def nested_grid_builder(n=4, depth=3, spp=1):
    """Sphere grid over a 4-material palette incl. depth-2 and depth-3
    mix chains (n=6 -> 216 spheres, past the brute kernel's cliff)."""
    b = SceneBuilder()
    b.camera = Camera.create((6, 5, 8), (0, 0, 0), (0, 1, 0), 50.0, 1.0)
    b.settings = RenderSettings(samples_per_pixel=spp, max_ray_depth=depth)
    mats = [
        b.add_material(Lambertian((0.7, 0.3, 0.2))),
        b.add_material(MixMaterial(
            MixMaterial(Lambertian((0.2, 0.6, 0.9)),
                        Metal((0.9, 0.9, 0.9), 0.05), 0.4),
            Dielectric(1.5), 0.6)),
        b.add_material(Emission((2.0, 1.5, 1.0))),
        b.add_material(MixMaterial(
            MixMaterial(MixMaterial(Lambertian((0.8, 0.2, 0.2)),
                                    Emission((1.5, 0.5, 0.2)), 0.3),
                        Metal((0.7, 0.8, 0.9), 0.1), 0.5),
            Lambertian((0.1, 0.9, 0.4)), 0.7)),
    ]
    rs = np.random.RandomState(0)
    for i in range(n):
        for j in range(n):
            for k in range(n):
                b.add_sphere(
                    ((i - n / 2) * 1.4, (j - n / 2) * 1.4,
                     (k - n / 2) * 1.4), 0.5, mats[rs.randint(4)])
    return b


def _cube(scale=1.0, center=(0, 0, 0)):
    c = np.asarray(center, np.float32)
    v = np.array([[x, y, z] for x in (-1, 1) for y in (-1, 1)
                  for z in (-1, 1)], np.float32) * scale + c
    f = np.array([[0, 1, 3], [0, 3, 2], [4, 6, 7], [4, 7, 5],
                  [0, 4, 5], [0, 5, 1], [2, 3, 7], [2, 7, 6],
                  [0, 2, 6], [0, 6, 4], [1, 5, 7], [1, 7, 3]], np.int32)
    return v, f


def test_mixn_cfg_and_gates():
    s = nested_grid_builder(n=6).build(with_bvh=True)  # 216 spheres
    assert PK._mix_depth(s) == 3
    mix, d_mix, m_pad = PK._mixn_cfg(s)
    assert (mix, d_mix, m_pad) == (False, 3, 128)
    assert PK.supports_bvh(s) and not PK.supports(s)
    # auto dispatch would refuse nothing; the brute kernel still gates
    assert not PK._mix_in_kernel_ok(s)


def test_mixn_bvh_matches_xla():
    """216-sphere nested-mix grid — the scene class VERDICT r4 #6 named
    (>128 primitives, mix-of-mix, on pallas_bvh)."""
    scene = nested_grid_builder(n=6, depth=3, spp=1).build(with_bvh=True)
    assert not PK.supports(scene) and PK.supports_bvh(scene)
    xla = np.asarray(render_linear(scene, 10, 10, seed=0, engine="xla"))
    bvh = np.asarray(render_linear(scene, 10, 10, seed=0,
                                   engine="pallas_bvh"))
    mismatched = (~np.isclose(xla, bvh, atol=1e-4, rtol=1e-3)).mean()
    assert mismatched <= 0.08, f"{mismatched:.4f} channels differ"
    # non-borderline pixels are BITWISE equal (shared RNG + exact one-hot
    # fetches); only root-rule flips may differ
    assert (xla == bvh).mean() >= 0.85


def test_mixn_bvh_triangles_and_volume_match_xla():
    """Nested mixes on triangles + a volume sphere in the same scene."""
    b = SceneBuilder()
    b.camera = Camera.create((0, 2.5, 4), (0, 0, 0), (0, 1, 0), 55.0, 1.0)
    b.settings = RenderSettings(samples_per_pixel=1, max_ray_depth=3)
    mm = b.add_material(MixMaterial(
        MixMaterial(Lambertian((0.6, 0.5, 0.3)),
                    Metal((0.9, 0.85, 0.8), 0.02), 0.35),
        Emission((1.2, 1.0, 0.8)), 0.8))
    ms = b.add_material(MixMaterial(
        Emission((2.0, 1.8, 1.4)),
        MixMaterial(Lambertian((0.2, 0.3, 0.8)), Dielectric(1.33), 0.5),
        0.5))
    n_side = 5
    xs = np.linspace(-2, 2, n_side + 1, dtype=np.float32)
    gx, gz = np.meshgrid(xs, xs, indexing="ij")
    gy = 0.3 * np.sin(gx * 2.1) * np.cos(gz * 1.7)
    verts = np.stack([gx, gy, gz], axis=-1).reshape(-1, 3).astype(np.float32)
    faces = []
    for i in range(n_side):
        for j in range(n_side):
            a = i * (n_side + 1) + j
            bq, c = a + 1, a + (n_side + 1)
            faces.append([a, bq, c])
            faces.append([bq, c + 1, c])
    b.add_mesh(Mesh.from_buffers(verts, verts,
                                 np.asarray(faces, np.int32), mm))
    b.add_sphere((0.6, 1.2, 0.0), 0.4, ms)
    iso = b.add_material(Isotropic((0.7, 0.7, 0.9)))
    vi = b.add_sphere((-0.8, 0.6, 0.0), 0.5, iso)
    b.add_volume(vi, 0.8)
    s = b.build(with_bvh=True)
    assert PK._mix_depth(s) == 2 and PK.supports_bvh(s)
    xla = np.asarray(render_linear(s, 12, 12, seed=0, engine="xla"))
    bvh = np.asarray(render_linear(s, 12, 12, seed=0, engine="pallas_bvh"))
    mismatched = (~np.isclose(xla, bvh, atol=1e-4, rtol=1e-3)).mean()
    assert mismatched <= 0.08, f"{mismatched:.4f} channels differ"


def test_mix_mesh_volume_combo_on_kernel():
    """Mix + MESH-VOLUME combinations (VERDICT r4 missing #4): a MIX
    delegated material on the boundary (lib/volume.rs:25-31) now runs on
    the packet kernel via the resolution chain — previously refused."""
    b = SceneBuilder()
    b.camera = Camera.create((0, 1.5, 5), (0, 0, 0), (0, 1, 0), 55.0, 1.0)
    b.settings = RenderSettings(samples_per_pixel=2, max_ray_depth=4)
    fog = b.add_material(MixMaterial(Isotropic((0.8, 0.8, 0.9)),
                                     Isotropic((0.9, 0.5, 0.3)), 0.5))
    lam = b.add_material(MixMaterial(Lambertian((0.7, 0.3, 0.2)),
                                     Metal((0.9, 0.9, 0.9), 0.1), 0.4))
    v, f = _cube(1.0)
    mi = b.add_mesh(Mesh.from_buffers(v, v, f, fog))
    b.add_volume(mi, 0.9)
    b.add_sphere((0.0, 0.0, 0.0), 0.45, lam)
    b.add_sphere((1.8, 0.3, 0.0), 0.4, lam)
    s = b.build(with_bvh=True)
    assert s.num_mesh_volumes == 1 and s.materials.has_mix
    assert PK.supports_bvh(s)
    # single-level + mv forces the chain scheme (d_mix >= 1)
    mix, d_mix, m_pad = PK._mixn_cfg(s)
    assert not mix and d_mix == 1 and m_pad == 128
    xla = np.asarray(render_linear(s, 12, 12, seed=0, engine="xla"))
    bvh = np.asarray(render_linear(s, 12, 12, seed=0, engine="pallas_bvh"))
    mismatched = (~np.isclose(xla, bvh, atol=1e-4, rtol=1e-3)).mean()
    assert mismatched <= 0.08, f"{mismatched:.4f} channels differ"


def test_mixn_bvh_grad_fd():
    """Record+replay gradients for nested-mix scenes: the replay
    re-resolves each recorded winner's DAG with the same per-level coins
    the kernel used, so AD of the fixed-seed loss must match central
    finite differences — including an albedo reachable ONLY through a
    depth-2 chain (mix -> mix -> lambertian leaf)."""
    scene = nested_grid_builder(n=3, depth=3, spp=1).build(with_bvh=True)
    assert PK.supports_bvh(scene)
    kind = np.asarray(scene.materials.kind)
    first = np.asarray(scene.materials.mix_first)
    leaf = None
    for m in np.nonzero(kind == 5)[0]:
        c = first[m]
        if kind[c] == 5 and kind[first[c]] == 0:
            leaf = int(first[c])
            break
    assert leaf is not None

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
    live = 0
    for i in range(3):
        eps = 1e-3
        want = (float(loss_j(a0.at[i].add(eps)))
                - float(loss_j(a0.at[i].add(-eps)))) / (2 * eps)
        np.testing.assert_allclose(float(g[i]), want, rtol=3e-2, atol=5e-3)
        live += abs(float(g[i])) > 1e-6
    assert live >= 2, "inner-leaf albedo gradient should be live"


def test_mixn_hidden_leaf_kind_compiles():
    """Lobe-compilation regression: a material kind reachable ONLY behind
    a depth-2 mix chain (no top-level instance anywhere in the scene)
    must still get its lobe compiled.  _bvh_kinds now walks the FULL mix
    DAG; the one-level walk it replaced silently dropped the Lambertian
    here, shading ~half the hits with the zero-attenuation default
    (caught by an env-scene A/B, r5)."""
    b = SceneBuilder()
    b.camera = Camera.create((0, 1.2, 4), (0, 0, 0), (0, 1, 0), 55.0, 1.0)
    b.settings = RenderSettings(samples_per_pixel=2, max_ray_depth=4)
    lam = Lambertian((0.7, 0.4, 0.3))
    # the ONLY Lambertian sits two levels deep; top level is mix+metal
    m = b.add_material(MixMaterial(MixMaterial(lam, lam, 0.5),
                                   Metal((0.9, 0.9, 0.9), 0.2), 0.5))
    rs = np.random.RandomState(0)
    for _ in range(40):
        p = rs.uniform(-2, 2, 3)
        b.add_sphere((p[0], p[1] * 0.5, p[2] * 0.5), 0.25, m)
    s = b.build(with_bvh=True)
    from raytracingrust_tpu.models import materials as M
    assert M.LAMBERTIAN in PK._bvh_kinds(s)
    xla = np.asarray(render_linear(s, 10, 10, seed=0, engine="xla"))
    bvh = np.asarray(render_linear(s, 10, 10, seed=0,
                                   engine="pallas_bvh"))
    mismatched = (~np.isclose(xla, bvh, atol=1e-4, rtol=1e-3)).mean()
    assert mismatched <= 0.08, f"{mismatched:.4f} channels differ"


def test_mixn_chain_bitwise_vs_s2_blend():
    """Controlled A/B: mix(mix(lam, lam, .5), met) resolves to the SAME
    material outcome as the flat mix(lam, met) for every coin draw, but
    the degenerate nest forces the resolution-chain scheme while the flat
    scene keeps the S2 leaf blend.  The two renders must be BITWISE
    identical — proving the chain machinery exact against the
    hardware-validated S2 path (also verified on the real v5e:
    docs/performance.md r5 nested-mix note)."""

    def grid(degenerate_nest, n=4, depth=4, spp=2):
        b = SceneBuilder()
        b.camera = Camera.create((6, 5, 8), (0, 0, 0), (0, 1, 0),
                                 50.0, 1.0)
        b.settings = RenderSettings(samples_per_pixel=spp,
                                    max_ray_depth=depth)
        lam = Lambertian((0.2, 0.6, 0.9))
        met = Metal((0.9, 0.9, 0.9), 0.05)
        if degenerate_nest:
            m1 = b.add_material(MixMaterial(MixMaterial(lam, lam, 0.5),
                                            met, 0.4))
        else:
            m1 = b.add_material(MixMaterial(lam, met, 0.4))
        mats = [b.add_material(Lambertian((0.7, 0.3, 0.2))), m1,
                b.add_material(Emission((2.0, 1.5, 1.0))),
                b.add_material(Dielectric(1.5))]
        rs = np.random.RandomState(0)
        for i in range(n):
            for j in range(n):
                for k in range(n):
                    b.add_sphere(
                        ((i - n / 2) * 1.4, (j - n / 2) * 1.4,
                         (k - n / 2) * 1.4), 0.5, mats[rs.randint(4)])
        return b.build(with_bvh=True)

    s_flat, s_nest = grid(False), grid(True)
    assert PK._mixn_cfg(s_flat) == (True, 0, 0)
    assert PK._mixn_cfg(s_nest)[1] == 2
    a = np.asarray(render_linear(s_flat, 10, 10, seed=0,
                                 engine="pallas_bvh"))
    b = np.asarray(render_linear(s_nest, 10, 10, seed=0,
                                 engine="pallas_bvh"))
    np.testing.assert_array_equal(a, b)


def test_mixn_env_is_hybrid_matches_xla():
    """Nested mixes through the env-IS hybrid (record walk + occlusion
    kernel + MIS replay): the replay re-resolves the DAG with the same
    coins, so the hybrid must track the XLA MIS estimator at the usual
    engine tolerance."""
    from raytracingrust_tpu import Background

    img = np.full((32, 64, 3), 0.08, np.float32)
    img[4:8, 10:14] = 40.0  # small bright sun
    b = SceneBuilder()
    b.camera = Camera.create((0, 1.2, 4), (0, 0, 0), (0, 1, 0), 55.0, 1.0)
    b.settings = RenderSettings(samples_per_pixel=2, max_ray_depth=4,
                                env_importance_sampling=True)
    m = b.add_material(MixMaterial(
        MixMaterial(Lambertian((0.7, 0.4, 0.3)),
                    Metal((0.9, 0.9, 0.9), 0.2), 0.5),
        Lambertian((0.2, 0.5, 0.8)), 0.5))
    rs = np.random.RandomState(0)
    for _ in range(40):
        p = rs.uniform(-2, 2, 3)
        b.add_sphere((p[0], p[1] * 0.5, p[2] * 0.5), 0.25, m)
    b.background = Background.skymap_from_array(img)
    s = b.build(with_bvh=True)
    assert PK.supports_bvh(s) and PK._mixn_cfg(s)[1] == 2
    xla = np.asarray(render_linear(s, 10, 10, seed=0, engine="xla"))
    bvh = np.asarray(render_linear(s, 10, 10, seed=0,
                                   engine="pallas_bvh"))
    mismatched = (~np.isclose(xla, bvh, atol=1e-4, rtol=1e-3)).mean()
    assert mismatched <= 0.08, f"{mismatched:.4f} channels differ"


def test_mixn_bvh_generations_bitwise():
    """Generation scheduling stays pure scheduling under the resolution
    chain (coins keyed by global ray id + bounce stream)."""
    scene = nested_grid_builder(n=3, depth=8, spp=2).build(with_bvh=True)
    assert PK.supports_bvh(scene)
    w = h = 8
    pixel_ids = jnp.arange(w * h, dtype=jnp.int32)
    iparams = PK.seed_words(0)
    out1 = np.asarray(PK.pixel_radiance_pallas_bvh(
        scene, pixel_ids, w, h, iparams, interpret=True, gens=1))
    out4 = np.asarray(PK.pixel_radiance_pallas_bvh(
        scene, pixel_ids, w, h, iparams, interpret=True, gens=4))
    np.testing.assert_array_equal(out1, out4)
