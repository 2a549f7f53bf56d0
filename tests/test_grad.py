"""Gradient correctness: AD vs finite differences of the fixed-seed renderer.

With uniforms fixed by seed, the renderer is a deterministic function of the
scene parameters; reparameterized path gradients (detached discrete events)
must match central finite differences wherever the function is smooth —
BASELINE.json: "pixel gradients allclose vs finite differences (material
albedo/roughness, emitter, camera params)".
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from raytracingrust_tpu import (
    Camera,
    Dielectric,
    Emission,
    Lambertian,
    Metal,
    RenderSettings,
    SceneBuilder,
)
from raytracingrust_tpu.diff.grad import (
    apply_params,
    extract_params,
    make_loss,
)


def builder():
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
    return b


def fd_check(names, rel_tol=5e-2, abs_floor=1e-4, eps=3e-4, bvh=False,
             make_builder=None):
    """AD vs central differences, discontinuity-aware.

    The reparameterized estimator deliberately omits visibility-edge
    (silhouette) terms; at those parameters FD itself is epsilon-unstable.
    Each probed coordinate is therefore measured at two step sizes — if the
    two FD estimates disagree, the probe straddles a discrete event and is
    skipped; stable probes must match AD.
    """
    scene = (make_builder or builder)().build(with_bvh=bvh)
    w = h = 8
    # arbitrary fixed target so the loss has nonzero gradient
    target = jnp.asarray(
        np.random.RandomState(0).rand(h, w, 3).astype(np.float32)
    )
    loss = jax.jit(make_loss(scene, target, w, h, seed=0))
    params = extract_params(scene, names)
    val, grads = jax.value_and_grad(loss)(params)
    assert np.isfinite(float(val))

    for name in names:
        g = np.asarray(grads[name], np.float64)
        p0 = np.asarray(params[name], np.float64)
        flat = p0.reshape(-1)
        idxs = np.linspace(0, flat.size - 1, min(6, flat.size)).astype(int)

        def fd_at(i, e):
            delta = np.zeros_like(flat)
            delta[i] = e
            pp = dict(params)
            pp[name] = jnp.asarray((flat + delta).reshape(p0.shape),
                                   jnp.float32)
            lp = float(loss(pp))
            pp[name] = jnp.asarray((flat - delta).reshape(p0.shape),
                                   jnp.float32)
            lm = float(loss(pp))
            return (lp - lm) / (2 * e)

        validated = 0
        for i in idxs:
            # stability probe at a LARGER step (a smaller one hits f32 loss
            # quantization noise); disagreement = discontinuity straddled
            fd1 = fd_at(i, eps)
            fd2 = fd_at(i, eps * 4)
            if abs(fd1 - fd2) > 0.25 * max(abs(fd1), abs(fd2)) + abs_floor:
                continue  # straddles a visibility/branch discontinuity
            ad = g.reshape(-1)[i]
            err = abs(fd1 - ad)
            tol = rel_tol * max(abs(fd1), abs(ad)) + abs_floor
            assert err <= tol, (
                f"{name}[{i}]: AD={ad:.6g} FD={fd1:.6g} err={err:.3g}"
            )
            validated += 1
        need = min(2, len(idxs))
        assert validated >= need, (
            f"{name}: too few smooth probes ({validated}/{len(idxs)})"
        )


def test_grad_albedo():
    fd_check(["albedo"])


def test_grad_emission():
    fd_check(["emission"])


def test_grad_fuzz():
    """Roughness gradient — flows through the reparameterized metal scatter
    direction."""
    fd_check(["fuzz"], rel_tol=0.1, abs_floor=3e-4)


def test_grad_background():
    fd_check(["bg_color_a"])


def test_grad_camera_direction_params():
    """FoV and look-at change ray directions smoothly; against a pure
    gradient background (no geometry edges) AD must track FD tightly."""
    from raytracingrust_tpu import Background

    def bg_only():
        b = SceneBuilder()
        b.camera = Camera.create((0.2, -0.1, 0.3), (0.1, 0.2, -1), (0, 1, 0),
                                 70.0, 1.0)
        b.settings = RenderSettings(samples_per_pixel=2, max_ray_depth=3)
        b.background = Background.gradient((0.2, 0.4, 0.9), (0.9, 0.9, 0.8))
        m = b.add_material(Lambertian((0.5, 0.5, 0.5)))
        b.add_sphere((0, 0, 50.0), 0.5, m)  # behind the camera: never seen
        return b

    # fov is in DEGREES: probe with a step big enough that the f32 loss
    # resolves the difference (FD quantization noise dominates below ~0.01)
    fd_check(["cam_fov"], rel_tol=0.1, abs_floor=1e-5, eps=0.03,
             make_builder=bg_only)
    fd_check(["cam_lookat"], rel_tol=0.05, abs_floor=1e-5, eps=1e-3,
             make_builder=bg_only)


def test_grad_camera_position():
    """Camera translation gradient, probed against a sphere that fills the
    whole frame (no silhouette in view -> smooth dependence)."""
    def wall():
        from raytracingrust_tpu import Background

        b = SceneBuilder()
        b.camera = Camera.create((0, 0, 2.0), (0, 0, 0), (0, 1, 0), 40.0, 1.0)
        # depth 2 = hit -> scatter -> background: one smooth shading event,
        # no multi-bounce re-hit flips.  The GRADIENT background makes the
        # radiance vary smoothly with the scattered direction (with a uniform
        # background the image would be piecewise CONSTANT in camera position
        # — lambertian albedo times a constant — and the true gradient zero).
        # 8 spp: more samples shrink each discrete flip's share of the FD,
        # so more probe coordinates pass the stability filter
        b.settings = RenderSettings(samples_per_pixel=8, max_ray_depth=2)
        b.background = Background.gradient((0.1, 0.3, 0.9), (1.0, 0.9, 0.7))
        m = b.add_material(Lambertian((0.6, 0.4, 0.3)))
        b.add_sphere((0, 0, 0), 1.5, m)  # covers the full 40-degree frustum
        return b

    # eps large enough that the f32 loss resolves the central difference
    # (the sphere's angular radius dwarfs the 2e-3 translation)
    fd_check(["cam_lookfrom"], rel_tol=0.1, abs_floor=1e-3, eps=2e-3,
             make_builder=wall)


def test_grad_through_bvh():
    """The BVH path re-intersects the winner differentiably outside the
    while_loop — gradients must survive traversal."""
    fd_check(["albedo"], bvh=True)


def test_grad_sphere_geometry():
    """Bonus beyond the reference scope: continuous geometry gradients
    (sphere center/radius) away from silhouettes."""
    fd_check(["sphere_radius"], rel_tol=0.15, abs_floor=2e-3, eps=1e-4)


def test_inverse_rendering_recovers_albedo():
    """End-to-end: perturb an albedo, optimize it back (BASELINE.json
    config #5, miniaturized).

    ``fit`` reseeds the loss every step (true SGD over path realizations),
    so the loss converges to the Monte-Carlo NOISE FLOOR — the expected MSE
    between a fresh-seed render at the TRUE params and the target — not to
    zero.  The assertions are therefore (a) the final losses sit near that
    measured floor and (b) the parameter itself is recovered."""
    from raytracingrust_tpu.diff.inverse import fit
    from raytracingrust_tpu.render.render import render_linear

    w = h = 8
    # near-converged target (spp 32) so the floor is dominated by the fit
    # renders' own variance, not the target's
    tb = builder()
    tb.settings = RenderSettings(samples_per_pixel=32, max_ray_depth=4)
    target = render_linear(tb.build(), w, h, seed=7)

    fb = builder()
    fb.settings = RenderSettings(samples_per_pixel=8, max_ray_depth=4)
    scene = fb.build()

    wrong = apply_params(
        scene,
        {"albedo": scene.materials.albedo.at[0].set(
            jnp.array([0.2, 0.7, 0.6])
        )},
    )
    out, params, history = fit(
        wrong, target, ["albedo"], w, h, steps=60, learning_rate=5e-2,
        constraints={"albedo": (0.0, 1.0)},
    )
    # MC noise floor: fresh-seed loss at the TRUE parameters
    floor = float(jnp.mean(
        (render_linear(scene, w, h, seed=999) - target) ** 2
    ))
    tail = float(np.mean(history[-5:]))
    assert tail < max(3.0 * floor, 0.3 * history[0]), (
        f"tail={tail:.5g} floor={floor:.5g} start={history[0]:.5g}"
    )
    np.testing.assert_allclose(
        np.asarray(out.materials.albedo[0]), [0.6, 0.3, 0.2], atol=0.08
    )
