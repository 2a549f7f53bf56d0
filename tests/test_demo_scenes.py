"""The repo's own demo scenes load, build, and render."""

import os

import numpy as np
import pytest

from raytracingrust_tpu import RenderSettings, SceneBuilder
from raytracingrust_tpu.render.render import render_linear

SCENES = os.path.join(os.path.dirname(__file__), "..", "scenes")


@pytest.mark.parametrize(
    "name", ["cornell_spheres", "material_zoo", "bvh_stress"]
)
def test_demo_scene_renders(name):
    import dataclasses

    b = SceneBuilder.from_file(os.path.join(SCENES, f"{name}.json"))
    # enough paths that "no path reaches the light" has negligible
    # probability for ANY RNG realization (cornell's small area light went
    # all-black at 8x8 spp1 depth3 once)
    b.settings = dataclasses.replace(
        b.settings, samples_per_pixel=4, max_ray_depth=4
    )
    scene = b.build()
    img = np.asarray(render_linear(scene, 12, 12, seed=0))
    assert np.isfinite(img).all()
    assert img.max() > 0


def test_demo_scenes_roundtrip(tmp_path):
    b = SceneBuilder.from_file(os.path.join(SCENES, "material_zoo.json"))
    p = tmp_path / "copy.json"
    b.save(str(p))
    b2 = SceneBuilder.from_file(str(p))
    assert b.to_json() == b2.to_json()
