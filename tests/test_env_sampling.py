"""Environment importance sampling (one-sample MIS) — BASELINE config #4.

The reference's SkyMap is lookup-only (lib/backgrounds.rs:84-93); finding a
small bright sun texel is left to blind BSDF sampling.  With
``env_importance_sampling`` on, each diffuse hit also draws one direction
from the sky's luminance x sin(theta) distribution and the two estimators
are balance-heuristic weighted.  Contract:

  * variance reduction: at equal spp, the importance-sampled image is
    strictly closer (MSE) to the converged reference on a sun-dominated
    scene;
  * unbiasedness: the two estimators agree in expectation;
  * the naive path's RNG is untouched (turning the knob off reproduces the
    reference estimator bit-for-bit).
"""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from raytracingrust_tpu import (
    Background,
    Camera,
    Lambertian,
    Metal,
    RenderSettings,
    SceneBuilder,
)
from raytracingrust_tpu.render.render import render_linear


def sun_sky(h=16, w=32, ambient=0.05, sun=150.0):
    """Mostly-dark sky with a tiny, very bright sun patch."""
    img = np.full((h, w, 3), ambient, np.float32)
    # reference convention: theta = acos(-y), texel row = (h-1) - floor(u*h)
    # -> row 0 is the ZENITH (y = +1).  Put the sun high in the sky.
    img[1:3, 5:7] = sun
    return img


def sun_scene(spp, seed_settings=None, depth=3):
    b = SceneBuilder()
    b.camera = Camera.create((0, 1.0, 4), (0, 0.5, 0), (0, 1, 0), 50.0, 1.0)
    b.settings = seed_settings or RenderSettings(
        samples_per_pixel=spp, max_ray_depth=depth, clamp_indirect=1e6
    )
    b.background = Background.skymap_from_array(sun_sky())
    ml = b.add_material(Lambertian((0.7, 0.6, 0.5)))
    mm = b.add_material(Metal((0.9, 0.9, 0.9), 0.15))
    b.add_sphere((0, -100, 0), 100.25, ml)   # ground
    b.add_sphere((0, 0.6, 0), 0.6, ml)       # hero ball
    b.add_sphere((1.3, 0.4, 0.7), 0.4, mm)   # specular (MIS w=1 path)
    return b


def with_is(scene, on=True):
    return dataclasses.replace(
        scene,
        settings=dataclasses.replace(scene.settings,
                                     env_importance_sampling=on),
    )


def test_env_is_off_is_bitwise_reference_estimator():
    """The knob must not perturb the naive path (extra NEE draws live in
    streams past the bounce range)."""
    scene = sun_scene(spp=4).build()
    a = np.asarray(render_linear(scene, 12, 12, seed=0, engine="xla"))
    b = np.asarray(render_linear(with_is(scene, False), 12, 12, seed=0,
                                 engine="xla"))
    np.testing.assert_array_equal(a, b)


def test_env_is_variance_reduction_and_unbiased():
    w = h = 12
    # converged reference: importance-sampled at high spp (lowest-variance
    # estimator available; unbiasedness vs naive asserted separately below)
    ref = np.asarray(render_linear(
        with_is(sun_scene(spp=512).build()), w, h, seed=99))

    def mse(img):
        return float(np.mean((np.asarray(img) - ref) ** 2))

    naive_scene = sun_scene(spp=16).build()
    is_scene = with_is(naive_scene)
    m_naive = np.mean([mse(render_linear(naive_scene, w, h, seed=s))
                       for s in range(3)])
    m_is = np.mean([mse(render_linear(is_scene, w, h, seed=s))
                    for s in range(3)])
    # a tiny sun found by NEE vs blind cosine sampling: the gap is large
    assert m_is < 0.5 * m_naive, f"IS {m_is:.4g} vs naive {m_naive:.4g}"

    # unbiasedness: naive at very high spp converges to the same IMAGE MEAN
    # (per-pixel the naive estimator is still noisy at 2048 spp — rare huge
    # sun hits — which is exactly why IS exists; averaging over the frame
    # brings its standard error well under the tolerance, while a wrong MIS
    # weight would shift the mean by O(ref.mean()))
    naive_mu = np.mean([
        np.asarray(render_linear(sun_scene(spp=2048).build(), w, h,
                                 seed=s)).mean()
        for s in (7, 8)
    ])
    assert abs(naive_mu - ref.mean()) < 0.08 * ref.mean() + 0.01, (
        f"naive mean {naive_mu:.4f} vs IS mean {ref.mean():.4f}"
    )


def test_env_is_differentiable():
    from raytracingrust_tpu.diff.grad import extract_params, make_loss

    scene = with_is(sun_scene(spp=2, depth=2).build())
    target = render_linear(scene, 8, 8, seed=5)
    loss = jax.jit(make_loss(scene, target, 8, 8, seed=0))
    params = extract_params(scene, ["albedo"])
    val, grads = jax.value_and_grad(loss)(params)
    g = np.asarray(grads["albedo"])
    assert np.isfinite(float(val))
    assert np.isfinite(g).all() and np.abs(g).sum() > 0


def test_env_is_json_roundtrip(tmp_path):
    import json

    s = RenderSettings(env_importance_sampling=True)
    d = s.to_json()
    assert d["env_importance_sampling"] is True
    assert RenderSettings.from_json(d).env_importance_sampling
    # default settings serialize WITHOUT the key (reference byte-parity)
    assert "env_importance_sampling" not in RenderSettings().to_json()


def test_env_is_matches_analytic_integral():
    """Analytic pin on the estimator (VERDICT r2 weak #6): for a lambertian
    plane under an equirect sky, the expected radiance is
    albedo * sum_texels L_t * (closed-form cosine-weighted solid angle).
    The per-texel integral is EXACT (piecewise-constant sky), so a subtly
    wrong MIS weight (even ~3%) shifts the importance-sampled mean outside
    the tolerance — far tighter than comparing against a noisy naive
    render."""
    h, w = 16, 32
    ambient, sun = 0.05, 150.0
    img = np.full((h, w, 3), ambient, np.float32)
    img[1:3, 5:7] = sun
    albedo = np.array([0.7, 0.6, 0.5], np.float32)

    # Exact cosine-weighted integral for an upward normal:
    # direction(theta, phi) has y = -cos(theta) (reference convention,
    # lib/utils/math.rs:24-29), so only theta > pi/2 contributes and
    # int -cos sin dtheta = (cos^2 b - cos^2 a)/2 per texel; image row ri
    # covers u*h in [h-1-ri, h-ri] (the reference's y flip).
    expected = np.zeros(3, np.float64)
    dphi = 2.0 * np.pi / w
    for ri in range(h):
        a_th = (h - 1 - ri) / h * np.pi
        b_th = (h - ri) / h * np.pi
        a_th = max(a_th, np.pi / 2)
        if a_th >= b_th:
            continue
        w_th = (np.cos(a_th) ** 2 - np.cos(b_th) ** 2) / 2.0
        for ci in range(w):
            expected += img[ri, ci].astype(np.float64) * w_th * dphi
    expected = albedo * expected / np.pi

    b = SceneBuilder()
    b.camera = Camera.create((0, 3.0, 0), (0, 0, 0), (0, 0, -1), 10.0, 1.0)
    b.settings = RenderSettings(samples_per_pixel=192, max_ray_depth=3,
                                clamp_indirect=1e6,
                                env_importance_sampling=True)
    b.background = Background.skymap_from_array(img)
    b.add_sphere((0, -100, 0), 100.0, b.add_material(Lambertian(albedo)))
    scene = b.build()

    means = [np.asarray(render_linear(scene, 8, 8, seed=s)).reshape(-1, 3)
             .mean(axis=0) for s in range(3)]
    got = np.mean(means, axis=0)
    rel = np.abs(got - expected) / expected
    assert rel.max() < 0.02, (got, expected, rel)

    # the naive estimator agrees in expectation too (unbiasedness), with a
    # looser bound set by its much larger variance on the tiny sun
    naive = dataclasses.replace(
        scene, settings=dataclasses.replace(
            scene.settings, env_importance_sampling=False,
            samples_per_pixel=4096))
    n_means = [np.asarray(render_linear(naive, 8, 8, seed=s))
               .reshape(-1, 3).mean(axis=0) for s in (11, 12, 13)]
    n_got = np.mean(n_means, axis=0)
    n_rel = np.abs(n_got - expected) / expected
    assert n_rel.max() < 0.15, (n_got, expected, n_rel)
