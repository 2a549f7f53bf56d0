#!/usr/bin/env python3
"""(Re)generate the golden regression images under tests/goldens/.

Run on CPU (the platform the test suite uses) after an INTENTIONAL
rendering-semantics change, and commit the result:

    python scripts/make_goldens.py

tests/test_goldens.py asserts current renders stay allclose to these
anchors so perf work in later rounds cannot silently drift the image
(VERDICT r1 item 10).
"""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

REF = "/root/reference"
OUT = os.path.join(os.path.dirname(__file__), "..", "tests", "goldens")


def golden_cases():
    """name -> (scene, width, height, seed).  Small frames, fixed seeds."""
    from raytracingrust_tpu import Camera, Lambertian, Mesh, RenderSettings, \
        SceneBuilder
    from raytracingrust_tpu.models.scene import load_scene

    cases = {}
    cases["benchmark"] = (
        load_scene(os.path.join(REF, "scenes", "benchmark.json")), 32, 26, 0)
    cases["simple"] = (
        load_scene(os.path.join(REF, "scenes", "simple.json")), 24, 24, 1)
    cases["bvh_stress"] = (
        load_scene(os.path.join(
            os.path.dirname(__file__), "..", "scenes", "bvh_stress.json")),
        24, 20, 2)

    b = SceneBuilder()
    b.camera = Camera.create((0, 0, 3), (0, 0, 0), (0, 1, 0), 40.0, 1.0)
    b.settings = RenderSettings(samples_per_pixel=4, max_ray_depth=8)
    m = b.add_material(Lambertian((0.7, 0.7, 0.7)))
    b.add_mesh(Mesh.from_file(os.path.join(REF, "assets", "monkey.obj"), m))
    cases["monkey"] = (b.build(with_bvh=True), 24, 24, 3)
    return cases


def main():
    from raytracingrust_tpu.render.render import render_linear

    os.makedirs(OUT, exist_ok=True)
    for name, (scene, w, h, seed) in golden_cases().items():
        img = np.asarray(render_linear(scene, w, h, seed=seed, engine="xla"))
        path = os.path.join(OUT, f"{name}.npz")
        np.savez_compressed(path, img=img, width=w, height=h, seed=seed)
        print(f"{name}: {img.shape} mean={img.mean():.5f} -> {path}")


if __name__ == "__main__":
    main()
