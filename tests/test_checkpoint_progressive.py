"""Checkpoint/resume + progressive accumulation tests."""

import numpy as np
import jax.numpy as jnp

from raytracingrust_tpu import Lambertian, Metal, RenderSettings, SceneBuilder
from raytracingrust_tpu.diff import checkpoint as ckpt
from raytracingrust_tpu.render.progressive import render_progressive
from raytracingrust_tpu.render.render import render_linear


def scene():
    b = SceneBuilder()
    b.settings = RenderSettings(samples_per_pixel=2, max_ray_depth=3)
    m = b.add_material(Lambertian((0.7, 0.5, 0.3)))
    mm = b.add_material(Metal((0.9, 0.9, 0.9), 0.1))
    b.add_sphere((0, -100.5, -1), 100.0, m)
    b.add_sphere((0, 0, -1.3), 0.5, mm)
    return b.build()


def test_checkpoint_roundtrip(tmp_path):
    tree = {"a": np.arange(6).reshape(2, 3), "b": [jnp.ones(4), 3]}
    p = str(tmp_path / "state.npz")
    ckpt.save(p, tree)
    back = ckpt.load(p, tree)
    np.testing.assert_array_equal(back["a"], tree["a"])
    np.testing.assert_array_equal(back["b"][0], np.ones(4))
    assert int(back["b"][1]) == 3


def test_checkpoint_shape_mismatch_rejected(tmp_path):
    p = str(tmp_path / "state.npz")
    ckpt.save(p, {"a": np.zeros(3)})
    assert ckpt.load(p, {"a": np.zeros(4)}) is None
    assert ckpt.load(str(tmp_path / "missing.npz"), {"a": np.zeros(3)}) is None


def test_progressive_variance_decreases():
    s = scene()
    acc = render_progressive(s, 10, 8, passes=4, seed=1)
    assert acc.passes == 4
    one_pass = np.asarray(render_linear(s, 10, 8, seed=1 * 1_000_003 + 0))
    # reference mean from a big independent render
    import dataclasses
    big = dataclasses.replace(
        s, settings=dataclasses.replace(s.settings, samples_per_pixel=16)
    )
    truth = np.asarray(render_linear(big, 10, 8, seed=999))
    err_one = np.abs(one_pass - truth).mean()
    err_acc = np.abs(acc.mean - truth).mean()
    assert err_acc < err_one  # accumulation converges


def test_progressive_resume(tmp_path):
    s = scene()
    p = str(tmp_path / "acc.npz")
    full = render_progressive(s, 8, 6, passes=4, seed=2)
    part = render_progressive(s, 8, 6, passes=2, seed=2, checkpoint_path=p)
    assert part.passes == 2
    resumed = render_progressive(s, 8, 6, passes=4, seed=2,
                                 checkpoint_path=p)
    assert resumed.passes == 4
    np.testing.assert_allclose(resumed.mean, full.mean, atol=1e-6)


def test_inverse_fit_checkpoint_resume(tmp_path):
    from raytracingrust_tpu.diff.inverse import fit

    s = scene()
    target = render_linear(s, 6, 5, seed=0)
    import dataclasses
    wrong = dataclasses.replace(
        s, materials=dataclasses.replace(
            s.materials,
            albedo=s.materials.albedo.at[0].set(jnp.array([0.2, 0.2, 0.8])),
        )
    )
    p = str(tmp_path / "fit.npz")
    _, params_full, hist_full = fit(wrong, target, ["albedo"], 6, 5,
                                    steps=10, learning_rate=3e-2)
    fit(wrong, target, ["albedo"], 6, 5, steps=5, learning_rate=3e-2,
        checkpoint_path=p, checkpoint_every=5)
    _, params_resumed, hist = fit(wrong, target, ["albedo"], 6, 5, steps=10,
                                  learning_rate=3e-2, checkpoint_path=p,
                                  checkpoint_every=5)
    assert len(hist) == 5  # resumed from step 5
    np.testing.assert_allclose(
        np.asarray(params_resumed["albedo"]),
        np.asarray(params_full["albedo"]), atol=1e-5,
    )
