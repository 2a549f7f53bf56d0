"""Pinhole camera.

Reproduces the reference camera model exactly (lib/core/camera.rs:27-57):
lookfrom/lookat/up + vertical FoV (degrees) + aspect ratio, with the
``get_ray(s, t) = lower_left + s*horizontal - t*vertical - origin`` convention
(note the MINUS vertical: t runs top-down, lib/core/camera.rs:19-24).

Unlike the reference, the basis computation lives *inside* the jitted render
function and is written in differentiable jnp — camera-pose/FoV gradients flow
through ray generation for inverse rendering (BASELINE.json north star).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..utils.pytree import pytree_dataclass
from ..utils.types import degrees_to_radians
from ..utils import vec


@pytree_dataclass
class Camera:
    lookfrom: jnp.ndarray  # (3,)
    lookat: jnp.ndarray    # (3,)
    vertical: jnp.ndarray  # (3,) world up vector ("vup")
    vertical_fov: jnp.ndarray  # () degrees
    aspect_ratio: jnp.ndarray  # ()

    @staticmethod
    def create(lookfrom, lookat, vertical=(0.0, 1.0, 0.0), vertical_fov=90.0,
               aspect_ratio=1.0) -> "Camera":
        f32 = lambda x: jnp.asarray(x, jnp.float32)
        return Camera(f32(lookfrom), f32(lookat), f32(vertical),
                      f32(vertical_fov), f32(aspect_ratio))

    @staticmethod
    def default() -> "Camera":
        """Scene::default camera (lib/core/scene.rs:45-51)."""
        return Camera.create((0.0, 0.0, 0.0), (0.0, 0.0, -1.0))

    def ray_origin(self):
        """Camera::ray_origin (lib/core/camera.rs:36-57) -> the four basis
        vectors (origin, horizontal, vertical, lower_left_corner)."""
        theta = degrees_to_radians(self.vertical_fov)
        h = jnp.tan(theta / 2.0)
        viewport_height = 2.0 * h
        viewport_width = self.aspect_ratio * viewport_height
        w = vec.normalize(self.lookfrom - self.lookat)
        u = vec.normalize(vec.cross(self.vertical, w))
        v = vec.cross(w, u)
        horizontal = viewport_width * u
        vertical = viewport_height * v
        lower_left = self.lookfrom - horizontal / 2.0 + vertical / 2.0 - w
        return self.lookfrom, horizontal, vertical, lower_left

    def get_rays(self, s, t):
        """Batched RayOrigin::get_ray (lib/core/camera.rs:19-24).

        ``s``/``t`` are (...,) uv arrays in [0,1]; returns (origins, dirs)
        with shape (..., 3).  Directions are NOT normalized, as in the
        reference (Ray directions are unnormalized throughout).
        """
        origin, horizontal, vertical, lower_left = self.ray_origin()
        d = (
            lower_left
            + s[..., None] * horizontal
            - t[..., None] * vertical
            - origin
        )
        o = jnp.broadcast_to(origin, d.shape)
        return o, d

    def to_json(self) -> dict:
        v3 = lambda a: {"x": float(a[0]), "y": float(a[1]), "z": float(a[2])}
        return {
            "lookfrom": v3(np.asarray(self.lookfrom)),
            "lookat": v3(np.asarray(self.lookat)),
            "vertical": v3(np.asarray(self.vertical)),
            "vertical_fov": float(self.vertical_fov),
            "aspect_ratio": float(self.aspect_ratio),
        }

    @staticmethod
    def from_json(d: dict) -> "Camera":
        v3 = lambda o: (o["x"], o["y"], o["z"])
        return Camera.create(
            v3(d["lookfrom"]), v3(d["lookat"]), v3(d["vertical"]),
            d["vertical_fov"], d["aspect_ratio"],
        )
