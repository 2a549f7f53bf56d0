"""The kernel-fetched replay backward (r5, VERDICT r4 weak #1).

``RTRT_REPLAY_FETCH=1`` routes the packet-BVH custom_vjp's backward
through the Pallas winner-row fetch kernel pair + the gather-free XLA
rows-replay (ops/pallas_megakernel._fetch_rows_cvjp +
diff/replay.replay_rows_radiance) instead of the classic table-gather
replay.  The two backwards must be BITWISE-equal: same records, same
uniforms, same op order (this pinned exactness is what makes the fetch
machinery a safe foundation — see docs/performance.md "the winner-fetch
wall" for why it is opt-in on current hardware).
"""

import os

import jax
import numpy as np
import pytest

import raytracingrust_tpu.ops.pallas_megakernel as PK
from raytracingrust_tpu import (Camera, Dielectric, Emission, Lambertian,
                                Mesh, Metal, RenderSettings, SceneBuilder)
from raytracingrust_tpu.diff.grad import extract_params, make_loss
from raytracingrust_tpu.models.scene import Background
from raytracingrust_tpu.render.render import render_linear
from raytracingrust_tpu.utils import rng

NAMES = ("albedo", "emission", "bg_color_a", "cam_lookfrom", "fuzz", "ir",
         "sphere_center", "sphere_radius")


@pytest.fixture
def fetch_env():
    os.environ["RTRT_REPLAY_FETCH"] = "1"
    # group=3 so a depth-5 chain exercises MULTI-GROUP slab slicing (the
    # production default is 10); keeps interpret-mode compiles affordable
    os.environ["RTRT_FETCH_GROUP"] = "3"
    PK._bvh_cvjp.cache_clear()
    yield
    os.environ.pop("RTRT_REPLAY_FETCH", None)
    os.environ.pop("RTRT_FETCH_GROUP", None)
    PK._bvh_cvjp.cache_clear()


def tri_sphere_scene(depth=5):
    b = SceneBuilder()
    ml = b.add_material(Lambertian((0.7, 0.35, 0.2)))
    mm = b.add_material(Metal((0.85, 0.85, 0.9), 0.15))
    md = b.add_material(Dielectric(1.5))
    me = b.add_material(Emission((1.8, 1.6, 1.2)))
    mg = b.add_material(Lambertian((0.5, 0.6, 0.3)))
    n = 9
    ang = np.linspace(0, 2 * np.pi, n, dtype=np.float32)
    rim = np.stack([0.7 * np.cos(ang), 0.25 + 0.12 * np.sin(3 * ang),
                    -1.0 + 0.7 * np.sin(ang)], 1)
    verts = np.concatenate([[[0, 0.45, -1.0]], rim]).astype(np.float32)
    faces = np.stack([np.zeros(n - 1, np.int32),
                      np.arange(1, n, dtype=np.int32),
                      1 + (np.arange(1, n, dtype=np.int32) % (n - 1))], -1)
    b.add_mesh(Mesh.from_buffers(verts, verts, faces, ml))
    b.add_sphere((0, -100.35, -1), 100.0, mg)
    b.add_sphere((0.55, 0.0, -0.6), 0.18, mm)
    b.add_sphere((-0.5, 0.05, -0.7), 0.2, md)
    b.add_sphere((4, 6, -3), 3.0, me)
    b.camera = Camera.create((0, 0.4, 1.6), (0, 0.1, -1), (0, 1, 0),
                             60.0, 4 / 3)
    b.settings = RenderSettings(samples_per_pixel=2, max_ray_depth=depth)
    b.background = Background.gradient((0.9, 0.9, 1.0), (0.4, 0.55, 0.9))
    return b.build(with_bvh=True)


def grads(scene, w, h, params, key):
    target = np.asarray(render_linear(scene, w, h, seed=9)) * 0.9
    loss = make_loss(scene, target, w, h, seed=0, engine="pallas_bvh")
    return jax.value_and_grad(loss)(params, key)


def test_fetch_backward_bitwise_vs_gather_replay(fetch_env):
    """Fetch-kernel backward == classic gather replay, bitwise, for every
    differentiable parameter class including geometry."""
    scene = tri_sphere_scene()
    params = extract_params(scene, NAMES)
    key = rng.base_key(0)
    vk, gk = grads(scene, 16, 12, params, key)

    os.environ["RTRT_REPLAY_KERNEL_DISABLE"] = "1"
    PK._bvh_cvjp.cache_clear()
    try:
        vx, gx = grads(scene, 16, 12, params, key)
    finally:
        os.environ.pop("RTRT_REPLAY_KERNEL_DISABLE", None)
        PK._bvh_cvjp.cache_clear()

    np.testing.assert_array_equal(np.asarray(vk), np.asarray(vx))
    for name in NAMES:
        np.testing.assert_array_equal(
            np.asarray(gk[name]), np.asarray(gx[name]),
            err_msg=f"grad mismatch: {name}")


def test_fetch_backward_fd(fetch_env):
    """Directional finite differences of the fetch-path loss match its
    own AD (fixed key -> smooth in albedo/emission/bg)."""
    import jax.numpy as jnp

    scene = tri_sphere_scene(depth=4)
    params = extract_params(scene, ("albedo", "bg_color_a"))
    target = np.asarray(render_linear(scene, 12, 10, seed=9)) * 0.9
    loss = make_loss(scene, target, 12, 10, seed=0, engine="pallas_bvh")
    key = rng.base_key(3)
    gen = np.random.default_rng(0)
    v = {k: jnp.asarray(gen.standard_normal(np.shape(p)), jnp.float32)
         for k, p in params.items()}
    _, g = jax.value_and_grad(loss)(params, key)
    ad = sum(float(jnp.vdot(g[k], v[k])) for k in params)
    eps = 1e-3
    plus = {k: params[k] + eps * v[k] for k in params}
    minus = {k: params[k] - eps * v[k] for k in params}
    fd = (float(loss(plus, key)) - float(loss(minus, key))) / (2 * eps)
    assert abs(ad - fd) <= 0.05 * max(abs(fd), 1e-6), (ad, fd)


# (multi-group slab slicing is covered by the bitwise test above: the
# fetch_env fixture pins RTRT_FETCH_GROUP=3, so its depth-5 chain spans
# two fetch launches.  A separate depth-12 test existed briefly and was
# dropped: interpret-mode compiles of the deep fetch+replay graphs took
# >20 minutes on the 2-vCPU CI host.)
