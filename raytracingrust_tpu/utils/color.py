"""Color handling.

Colors are plain ``(..., 3)`` f32 arrays (linear RGB) everywhere on device;
this module holds the conversions at the edges, mirroring the reference's
``lib/utils/color.rs`` but with an explicit clamp (the reference relies on
Rust's saturating ``as u8`` cast — quirk Q8 in SURVEY.md)."""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def linear_to_raw(rgb):
    """f32 linear RGB in [0, 1] -> u8, matching ``Color::into_raw``
    (lib/utils/color.rs:34-41): scale by 255, truncate toward zero, saturate.
    Gamma correction (sqrt) is applied by the render loop *before* this, as in
    lib/core/render.rs:103-107."""
    return jnp.clip(jnp.floor(rgb * 255.0), 0.0, 255.0).astype(jnp.uint8)


def to_rgba8(rgb):
    """(..., 3) f32 -> (..., 4) u8 RGBA with opaque alpha, the framebuffer
    layout of ``RenderTarget`` (lib/core/render.rs:14-30)."""
    raw = linear_to_raw(rgb)
    alpha = jnp.full(raw.shape[:-1] + (1,), 255, dtype=jnp.uint8)
    return jnp.concatenate([raw, alpha], axis=-1)


def np_to_rgba8(rgb: np.ndarray) -> np.ndarray:
    """NumPy twin of :func:`to_rgba8` for host-side writers."""
    raw = np.clip(np.floor(rgb * 255.0), 0.0, 255.0).astype(np.uint8)
    alpha = np.full(raw.shape[:-1] + (1,), 255, dtype=np.uint8)
    return np.concatenate([raw, alpha], axis=-1)
