"""EXR IO + SkyMap background tests."""

import numpy as np
import jax.numpy as jnp
import pytest

from raytracingrust_tpu.io.exr import read_exr, write_exr
from raytracingrust_tpu.models.backgrounds import Background


def radiance_image(h=16, w=32):
    rs = np.random.RandomState(3)
    img = rs.rand(h, w, 3).astype(np.float32) * 4.0
    img[2:5, 7:12] *= 20.0  # a bright "sun" patch
    return img


def test_exr_roundtrip(tmp_path):
    img = radiance_image()
    p = tmp_path / "x.exr"
    write_exr(str(p), img)
    back = read_exr(str(p))
    np.testing.assert_array_equal(img, back)


def test_skymap_equirect_lookup(tmp_path):
    img = radiance_image()
    p = tmp_path / "sky.exr"
    write_exr(str(p), img)
    bg = Background.skymap(str(p))
    h, w = img.shape[:2]

    # reference convention (lib/backgrounds.rs:84-93 + math.rs:24-29):
    # dir = +x => theta = pi/2, phi = pi => u = 0.5, v = 0.5
    # => x = (0.5*w) % w ; y = h－1－(0.5*h) % h
    d = jnp.array([[1.0, 0.0, 0.0]])
    got = np.asarray(bg.sample(d))[0]
    x = int(0.5 * w) % w
    y = (h - 1) - int(0.5 * h) % h
    np.testing.assert_allclose(got, img[y, x], rtol=1e-6)

    # straight down (-y): theta = acos(1) = 0 -> u=0 -> y = h-1
    d = jnp.array([[0.0, -1.0, 0.0]])
    got = np.asarray(bg.sample(d))[0]
    # phi = atan2(0, 0) + pi = pi -> v = 0.5
    np.testing.assert_allclose(got, img[h - 1, x], rtol=1e-6)


def test_skymap_render_smoke(tmp_path):
    from raytracingrust_tpu import Lambertian, RenderSettings, SceneBuilder
    from raytracingrust_tpu.render.render import render_linear

    img = radiance_image()
    p = tmp_path / "sky.exr"
    write_exr(str(p), img)
    b = SceneBuilder()
    b.background = Background.skymap(str(p))
    b.settings = RenderSettings(samples_per_pixel=2, max_ray_depth=3)
    m = b.add_material(Lambertian((0.5, 0.5, 0.5)))
    b.add_sphere((0, 0, -2), 0.5, m)
    out = np.asarray(render_linear(b.build(), 8, 8, seed=0))
    assert np.isfinite(out).all() and out.max() > 0


def test_skymap_importance_sampling_distribution(tmp_path):
    """Sampled directions must land in bright texels proportionally to
    luminance x solid angle (the capability the reference lacks —
    SURVEY.md section 2.2 SkyMap row)."""
    from raytracingrust_tpu.models.backgrounds import sample_skymap_direction

    img = radiance_image()
    p = tmp_path / "sky.exr"
    write_exr(str(p), img)
    bg = Background.skymap(str(p))

    n = 4096
    rs = np.random.RandomState(0)
    u = jnp.asarray(rs.rand(n, 2).astype(np.float32))
    dirs, pdf = sample_skymap_direction(bg, u[:, 0], u[:, 1])
    dirs, pdf = np.asarray(dirs), np.asarray(pdf)
    np.testing.assert_allclose(np.linalg.norm(dirs, axis=1), 1.0, atol=1e-4)
    assert (pdf > 0).all()

    # Monte-Carlo estimate of total environment power using the pdf:
    # E[L(dir)/pdf(dir)] = integral of luminance over the sphere
    lum_sampled = np.asarray(bg.sample(jnp.asarray(dirs))) @ np.array(
        [0.2126, 0.7152, 0.0722]
    )
    est = (lum_sampled / pdf).mean()
    # analytic: sum over texels of lum * solid angle
    h, w = img.shape[:2]
    lum = img @ np.array([0.2126, 0.7152, 0.0722], np.float32)
    theta = (np.arange(h) + 0.5) / h * np.pi
    d_omega = (np.pi / h) * (2 * np.pi / w) * np.sin(theta)[:, None]
    truth = float((lum * d_omega[::-1]).sum())
    assert abs(est - truth) / truth < 0.05
