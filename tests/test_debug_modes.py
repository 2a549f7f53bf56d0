"""Normal/Random inspection views on the packet-traversal kernel (r5,
VERDICT r4 weak #7): the interactive viewer's two debug modes used to drop
to the XLA engine exactly on the big scenes where inspection matters.
Reference semantics: the trace_ray mode switch (lib/core/render.rs:42-49).
"""

import dataclasses

import numpy as np

from raytracingrust_tpu import (Camera, Lambertian, Mesh, Metal,
                                RenderSettings, SceneBuilder)
from raytracingrust_tpu.models.scene import (MODE_NORMAL, MODE_RANDOM,
                                             Background)
from raytracingrust_tpu.render.render import render_linear, select_engine


def scene(mode):
    b = SceneBuilder()
    ml = b.add_material(Lambertian((0.7, 0.35, 0.2)))
    mm = b.add_material(Metal((0.85, 0.85, 0.9), 0.15))
    n = 9
    ang = np.linspace(0, 2 * np.pi, n, dtype=np.float32)
    rim = np.stack([0.7 * np.cos(ang), 0.25 + 0.12 * np.sin(3 * ang),
                    -1.0 + 0.7 * np.sin(ang)], 1)
    verts = np.concatenate([[[0, 0.45, -1.0]], rim]).astype(np.float32)
    faces = np.stack([np.zeros(n - 1, np.int32),
                      np.arange(1, n, dtype=np.int32),
                      1 + (np.arange(1, n, dtype=np.int32) % (n - 1))], -1)
    b.add_mesh(Mesh.from_buffers(verts, verts, faces, ml))
    b.add_sphere((0, -100.35, -1), 100.0, ml)
    b.add_sphere((0.55, 0.0, -0.6), 0.18, mm)
    b.camera = Camera.create((0, 0.4, 1.6), (0, 0.1, -1), (0, 1, 0),
                             60.0, 4 / 3)
    b.settings = RenderSettings(samples_per_pixel=2, max_ray_depth=6,
                                mode=mode)
    b.background = Background.gradient((0.9, 0.9, 1.0), (0.4, 0.55, 0.9))
    return b.build(with_bvh=True)


def _check_mode(mode):
    s = scene(mode)
    xla = np.asarray(render_linear(s, 20, 16, seed=3, engine="xla"))
    pal = np.asarray(render_linear(s, 20, 16, seed=3,
                                   engine="pallas_bvh"))
    # single intersection pass: the engines' winner math differs at ulp
    # level on a handful of borderline rays (test_pallas_bvh family)
    neq = (np.abs(xla - pal) > 1e-5).any(-1)
    assert neq.mean() <= 4 / (20 * 16), f"{neq.sum()} pixels differ"


def test_normal_mode_kernel_parity():
    _check_mode(MODE_NORMAL)


def test_random_mode_kernel_parity():
    _check_mode(MODE_RANDOM)


def test_debug_modes_dispatch_to_kernel():
    """Auto dispatch routes big-scene debug views to the packet kernel on
    TPU; on the CPU test host it resolves to xla (interpret kernels are
    correctness tools) — assert the capability gate directly instead."""
    from raytracingrust_tpu.ops.pallas_megakernel import (supports,
                                                          supports_bvh)

    s = scene(MODE_NORMAL)
    assert supports_bvh(s)
    assert not supports(s)  # the brute kernel has no debug-view pass
    # skymap debug stays XLA (miss-record machinery not worth a non-perf
    # path)
    sky = dataclasses.replace(
        s, background=Background.skymap_from_array(
            np.ones((4, 8, 3), np.float32)))
    assert not supports_bvh(sky)
