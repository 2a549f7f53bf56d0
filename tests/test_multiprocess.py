"""Real multi-process execution of the DCN path (VERDICT r1 item 5).

Round 1's ``render_multihost`` multi-process branch and ``initialize()``
had never executed anywhere (no pod available).  This test launches TWO
actual OS processes with ``jax.distributed.initialize`` over a localhost
coordinator (CPU backend, 2 virtual devices each -> a 4-device global
mesh), runs ``render_multihost`` end-to-end — process-local feeds,
global-array jit, cross-process ``process_allgather`` — and asserts the
allgathered frame is BITWISE the single-process render (counter RNG makes
every decomposition identical, parallel/distributed.py docstring).
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

WORKER = r"""
import os, sys
pid = int(sys.argv[1]); port = sys.argv[2]; out = sys.argv[3]
flags = os.environ.get("XLA_FLAGS", "")
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")

from raytracingrust_tpu.parallel import distributed

ok = distributed.initialize(coordinator_address=f"localhost:{port}",
                            num_processes=2, process_id=pid)
assert ok, "initialize() returned False in a 2-process launch"
assert jax.process_count() == 2, jax.process_count()
assert jax.device_count() == 4, jax.device_count()

from raytracingrust_tpu import Camera, Dielectric, Emission, Lambertian, \
    Metal, RenderSettings, SceneBuilder

b = SceneBuilder()
b.camera = Camera.create((0, 0, 0.4), (0, 0, -1), (0, 1, 0), 70.0, 1.0)
b.settings = RenderSettings(samples_per_pixel=2, max_ray_depth=4)
m1 = b.add_material(Lambertian((0.6, 0.3, 0.2)))
m2 = b.add_material(Metal((0.9, 0.8, 0.7), 0.2))
m3 = b.add_material(Emission((1.5, 1.0, 0.5)))
m4 = b.add_material(Dielectric(1.5))
b.add_sphere((0.0, -0.25, -1.0), 0.35, m1)
b.add_sphere((0.75, 0.1, -1.3), 0.4, m2)
b.add_sphere((-0.75, 0.1, -1.3), 0.4, m3)
b.add_sphere((0.0, 0.65, -1.2), 0.3, m4)
scene = b.build()

img = distributed.render_multihost(scene, 8, 8, seed=0)
import numpy as np
np.savez(out, img=img)
jax.distributed.shutdown()
"""


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_render_multihost(tmp_path):
    port = _free_port()
    script = tmp_path / "worker.py"
    script.write_text(WORKER)
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # workers set their own device count
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")

    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(i), str(port),
             str(tmp_path / f"out{i}.npz")],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        )
        for i in range(2)
    ]
    logs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=240)
            logs.append(out.decode(errors="replace"))
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.fail("multi-process workers hung (rendezvous failure?)")
    for p, log in zip(procs, logs):
        assert p.returncode == 0, f"worker failed:\n{log[-3000:]}"

    # every host assembled the same full frame
    img0 = np.load(tmp_path / "out0.npz")["img"]
    img1 = np.load(tmp_path / "out1.npz")["img"]
    np.testing.assert_array_equal(img0, img1)

    # ... and it is bitwise the single-process render (this pytest process
    # runs with 8 virtual devices — a third decomposition)
    from raytracingrust_tpu.parallel import distributed
    from raytracingrust_tpu import (Camera, Dielectric, Emission, Lambertian,
                                    Metal, RenderSettings, SceneBuilder)

    b = SceneBuilder()
    b.camera = Camera.create((0, 0, 0.4), (0, 0, -1), (0, 1, 0), 70.0, 1.0)
    b.settings = RenderSettings(samples_per_pixel=2, max_ray_depth=4)
    m1 = b.add_material(Lambertian((0.6, 0.3, 0.2)))
    m2 = b.add_material(Metal((0.9, 0.8, 0.7), 0.2))
    m3 = b.add_material(Emission((1.5, 1.0, 0.5)))
    m4 = b.add_material(Dielectric(1.5))
    b.add_sphere((0.0, -0.25, -1.0), 0.35, m1)
    b.add_sphere((0.75, 0.1, -1.3), 0.4, m2)
    b.add_sphere((-0.75, 0.1, -1.3), 0.4, m3)
    b.add_sphere((0.0, 0.65, -1.2), 0.3, m4)
    scene = b.build()
    local = distributed.render_multihost(scene, 8, 8, seed=0)
    np.testing.assert_array_equal(img0, np.asarray(local))
