"""Interactive viewer tests: Editable schema round-trip + HTTP server.

Covers the reference's GUI layer equivalents (SURVEY.md section 2.4): the
settings panel knobs (src/gui.rs:221-292), per-type property widgets
(lib/gui/gui.rs:9-92), the render trigger + timing label (src/gui.rs:324-331),
and continuous re-render (src/gui.rs:333-337)."""

import json
import time
import urllib.request

import numpy as np
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
from raytracingrust_tpu.models.backgrounds import Background
from raytracingrust_tpu.viewer import (
    ViewerApp,
    apply_edits,
    editable_schema,
    editable_values,
)
from raytracingrust_tpu.viewer.server import make_server


def tiny_builder() -> SceneBuilder:
    b = SceneBuilder()
    b.camera = Camera.create((0, 0, 0), (0, 0, -1), (0, 1, 0), 90.0, 1.0)
    b.settings = RenderSettings(samples_per_pixel=1, max_ray_depth=2,
                                enable_bvh_tree=False)
    b.background = Background.gradient((1.0, 1.0, 1.0), (0.5, 0.7, 1.0))
    lam = b.add_material(Lambertian((0.8, 0.3, 0.3)))
    met = b.add_material(Metal((0.9, 0.9, 0.9), 0.1))
    b.add_material(Dielectric(1.5))
    b.add_material(Emission((2.0, 2.0, 2.0)))
    b.add_material(MixMaterial(Lambertian((1, 0, 0)), Metal((0, 1, 0), 0.2),
                               0.5))
    b.add_sphere((0, 0, -1), 0.5, lam)
    b.add_sphere((0, -100.5, -1), 100.0, met)
    return b


# ------------------------------------------------------------- editable layer

def test_schema_covers_values():
    b = tiny_builder()
    schema = editable_schema(b)
    values = editable_values(b)
    paths = [w["path"] for ws in schema.values() for w in ws
             if w["widget"] != "static"]
    assert len(paths) == len(set(paths))
    for p in paths:
        assert p in values, f"schema path {p} missing a value"
    # the reference panel's knobs are all present (src/gui.rs:221-292)
    for knob in ("settings.samples_per_pixel", "settings.max_ray_depth",
                 "settings.clamp_indirect", "settings.mode",
                 "settings.enable_bvh_tree", "camera.lookfrom",
                 "camera.vertical_fov", "background.top"):
        assert knob in paths


def test_apply_edits_roundtrip():
    b = tiny_builder()
    apply_edits(b, {
        "settings.samples_per_pixel": 7,
        "settings.mode": "Clay",
        "camera.vertical_fov": 45.0,
        "camera.lookfrom": [1.0, 2.0, 3.0],
        "background.top": [0.1, 0.2, 0.3],
        "materials.0.albedo": [0.5, 0.5, 0.5],
        "materials.1.fuzz": 0.7,
        "materials.4.factor": 0.25,
        "materials.4.first.albedo": [0.0, 0.0, 1.0],
    })
    v = editable_values(b)
    assert v["settings.samples_per_pixel"] == 7
    assert v["settings.mode"] == "Clay"
    assert v["camera.vertical_fov"] == 45.0
    assert v["camera.lookfrom"] == [1.0, 2.0, 3.0]
    assert np.allclose(v["background.top"], [0.1, 0.2, 0.3])
    assert np.allclose(v["materials.0.albedo"], [0.5, 0.5, 0.5])
    assert v["materials.1.fuzz"] == pytest.approx(0.7)
    assert v["materials.4.factor"] == 0.25
    assert np.allclose(v["materials.4.first.albedo"], [0, 0, 1])
    # the edited builder still builds a renderable scene
    scene = b.build()
    assert scene.settings.samples_per_pixel == 7


def test_uniform_background_edit():
    b = tiny_builder()
    b.background = Background.uniform((0.6, 0.6, 0.6))
    apply_edits(b, {"background.color": [0.2, 0.4, 0.6]})
    assert np.allclose(editable_values(b)["background.color"], [0.2, 0.4, 0.6])


# ----------------------------------------------------------------- http app

@pytest.fixture()
def viewer():
    app = ViewerApp(tiny_builder(), 24, 16, max_passes=2).start()
    httpd = make_server(app, "127.0.0.1", 0)
    import threading
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    base = f"http://127.0.0.1:{httpd.server_address[1]}"
    yield app, base
    httpd.shutdown()
    httpd.server_close()
    app.stop()


def _get(url: str):
    with urllib.request.urlopen(url, timeout=30) as r:
        return r.read()


def _post(url: str, body: dict):
    req = urllib.request.Request(url, data=json.dumps(body).encode(),
                                 method="POST")
    with urllib.request.urlopen(req, timeout=30) as r:
        return json.loads(r.read())


def _wait_pass(base: str, min_passes: int, timeout: float = 120.0) -> dict:
    deadline = time.time() + timeout
    while time.time() < deadline:
        s = json.loads(_get(base + "/api/status"))
        assert not s["error"], s["error"]
        if s["passes"] >= min_passes:
            return s
        time.sleep(0.2)
    raise AssertionError(f"no pass within {timeout}s")


def test_server_end_to_end(viewer):
    app, base = viewer
    assert b"raytracingrust-tpu viewer" in _get(base + "/")

    state = json.loads(_get(base + "/api/state"))
    assert "Render settings" in state["schema"]
    assert state["values"]["settings.samples_per_pixel"] == 1

    s = _wait_pass(base, 1)
    assert s["total_spp"] >= 1 and s["last_pass_ms"] > 0
    png = _get(base + "/frame.png")
    assert png[:8] == b"\x89PNG\r\n\x1a\n"

    # edit restarts accumulation; the worker picks the change up
    _post(base + "/api/edit", {"settings.mode": "Normal"})
    assert json.loads(_get(base + "/api/state"))["values"][
        "settings.mode"] == "Normal"
    _wait_pass(base, 1)

    # the Render Image button works beyond max_passes
    for _ in range(3):
        _post(base + "/api/render", {})
    _post(base + "/api/continuous", {"on": False})


def test_server_save_scene(viewer, tmp_path):
    app, base = viewer
    out = tmp_path / "saved.json"
    _post(base + "/api/save", {"path": str(out)})
    saved = json.loads(out.read_text())
    assert saved["settings"]["samples_per_pixel"] == 1
    assert len(saved["objects"]) == 2
    # saved scene loads back
    assert SceneBuilder.from_file(str(out)).build() is not None
