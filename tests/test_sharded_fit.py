"""The multi-device fit PRODUCT path (VERDICT r4 missing #1): a sharded
``diff.inverse.fit`` / ``diff.grad.make_loss(mesh=)`` must match the
single-device fit on the 8-way virtual CPU mesh (conftest).

Two comparison regimes:
  * ACROSS MESH SIZES (1-dev vs 8-dev): the sharded loss is ONE global
    trace whose inputs carry NamedShardings, so any decomposition runs
    the same per-ray arithmetic — tight tolerances.
  * vs the SINGLE-DEVICE make_loss: a different XLA program
    (render_linear's lax.map tiling vs the flat masked-SSE), so
    ulp-borderline paths can flip on a handful of rays — the engine
    tolerance family (see tests/test_pallas.py docstrings).

The reference analog is rayon transparently scaling the whole workload
(lib/core/render.rs:114-126); here the training loop itself is the
workload, and the parameter-gradient all-reduce is the BASELINE.json
north-star collective.
"""

import jax
import numpy as np
import pytest

from raytracingrust_tpu import (Emission, Lambertian, Metal, RenderSettings,
                                SceneBuilder)
from raytracingrust_tpu.diff.grad import extract_params, make_loss
from raytracingrust_tpu.diff.inverse import fit
from raytracingrust_tpu.parallel.sharding import make_mesh
from raytracingrust_tpu.render.render import render_linear


def scene_builder():
    b = SceneBuilder()
    b.settings = RenderSettings(samples_per_pixel=2, max_ray_depth=4)
    ground = b.add_material(Lambertian((0.7, 0.6, 0.2)))
    red = b.add_material(Lambertian((0.8, 0.2, 0.1)))
    mirror = b.add_material(Metal((0.9, 0.9, 0.9), 0.1))
    sun = b.add_material(Emission((1.5, 1.4, 1.2)))
    b.add_sphere((0, -100.5, -1), 100.0, ground)
    b.add_sphere((-0.4, 0, -1.2), 0.4, red)
    b.add_sphere((0.6, 0, -1.5), 0.5, mirror)
    b.add_sphere((5, 8, -2), 4.0, sun)
    return b


W, H = 12, 10


def target_image(scene):
    return np.asarray(render_linear(scene, W, H, seed=99))


def test_sharded_loss_mesh_size_invariant():
    """1-device mesh == 8-device mesh, value AND grads, tight: the global
    trace is identical; only the GSPMD partitioning differs."""
    scene = scene_builder().build()
    target = target_image(scene)
    params = extract_params(scene, ["albedo", "emission", "cam_fov"])
    params["albedo"] = params["albedo"] * 0.8

    l1 = make_loss(scene, target, W, H, seed=3,
                   mesh=make_mesh(jax.devices()[:1]))
    l8 = make_loss(scene, target, W, H, seed=3,
                   mesh=make_mesh(jax.devices()[:8]))
    v1, g1 = jax.value_and_grad(l1)(params)
    v8, g8 = jax.value_and_grad(l8)(params)
    np.testing.assert_allclose(float(v1), float(v8), rtol=1e-6)
    for name in params:
        np.testing.assert_allclose(np.asarray(g1[name]),
                                   np.asarray(g8[name]),
                                   rtol=2e-5, atol=1e-7,
                                   err_msg=f"grad mismatch: {name}")


def test_sharded_loss_matches_single_device():
    """vs the single-device make_loss: same estimator, different XLA
    program — engine-family tolerances (borderline paths may flip)."""
    scene = scene_builder().build()
    target = target_image(scene)
    params = extract_params(scene, ["albedo", "emission"])
    params["albedo"] = params["albedo"] * 0.8

    single = make_loss(scene, target, W, H, seed=3)
    sharded = make_loss(scene, target, W, H, seed=3,
                        mesh=make_mesh(jax.devices()[:8]))
    v1, g1 = jax.value_and_grad(single)(params)
    v2, g2 = jax.value_and_grad(sharded)(params)
    np.testing.assert_allclose(float(v1), float(v2), rtol=2e-2)
    for name in params:
        a, b = np.asarray(g1[name]), np.asarray(g2[name])
        rel = np.abs(a - b) / (np.abs(b) + 1e-3)
        assert rel.max() < 5e-2, f"{name}: grad rel err {rel.max()}"


def test_sharded_grads_nondivisible_frame():
    """19x7 = 133 pixels does not divide 8: the pad-lane mask must keep
    both the loss normalization and the gradients exact across mesh
    sizes."""
    scene = scene_builder().build()
    target = np.asarray(render_linear(scene, 19, 7, seed=4))
    params = extract_params(scene, ["albedo"])
    params["albedo"] = params["albedo"] * 1.1

    l1 = make_loss(scene, target, 19, 7, seed=1,
                   mesh=make_mesh(jax.devices()[:1]))
    l8 = make_loss(scene, target, 19, 7, seed=1,
                   mesh=make_mesh(jax.devices()[:8]))
    v1, g1 = jax.value_and_grad(l1)(params)
    v8, g8 = jax.value_and_grad(l8)(params)
    np.testing.assert_allclose(float(v1), float(v8), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(g1["albedo"]),
                               np.asarray(g8["albedo"]),
                               rtol=2e-5, atol=1e-7)


def test_sharded_fit_trajectory_mesh_size_invariant():
    """A 5-step sharded Adam fit follows the same trajectory on a
    1-device and an 8-device mesh, and actually optimizes."""
    base = scene_builder()
    true_scene = base.build()
    target = target_image(true_scene)

    def perturbed():
        s = scene_builder().build()
        import dataclasses
        mats = dataclasses.replace(
            s.materials, albedo=s.materials.albedo * 0.6)
        return dataclasses.replace(s, materials=mats)

    _, p_1, h_1 = fit(
        perturbed(), target, ["albedo"], W, H, steps=5,
        learning_rate=5e-2, seed=7, mesh=make_mesh(jax.devices()[:1]))
    _, p_8, h_8 = fit(
        perturbed(), target, ["albedo"], W, H, steps=5,
        learning_rate=5e-2, seed=7, mesh=make_mesh(jax.devices()[:8]))

    np.testing.assert_allclose(h_1, h_8, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(p_1["albedo"]),
                               np.asarray(p_8["albedo"]),
                               rtol=1e-4, atol=1e-6)
    assert h_8[-1] < h_8[0]  # it actually optimizes


def test_sharded_flag_builds_mesh():
    """fit(sharded=True) auto-meshes over all visible devices."""
    scene = scene_builder().build()
    target = target_image(scene)
    _, params, history = fit(scene, target, ["albedo"], W, H, steps=2,
                             learning_rate=1e-2, seed=0, sharded=True)
    assert len(history) == 2
    assert np.isfinite(history).all()
