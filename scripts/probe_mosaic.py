#!/usr/bin/env python3
"""Probe: does Mosaic support the (8,256)->(2048,1) reshape + MXU dot
pattern the dense-triangle megakernel needs?  Runs a tiny kernel on the
current platform and checks against numpy."""

import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

R, C = 8, 256
B = R * C
T = 512


def kernel(x_ref, y_ref, w_ref, out_ref):
    x = x_ref[...]                      # (8, 256)
    y = y_ref[...]
    f1 = x.reshape(B, 1)                # sublane/lane relayout
    f2 = y.reshape(B, 1)
    feats = jnp.concatenate([f1, f2, f1 * f2], axis=1)   # (B, 3)
    m = jnp.dot(feats, w_ref[...], preferred_element_type=jnp.float32)
    # (B, T) -> min + argmin over T, back to (8, 256)
    tmin = m.min(axis=1)
    amin = jnp.argmin(m, axis=1).astype(jnp.float32)
    out_ref[...] = (tmin + 0.001 * amin).reshape(R, C)


def main():
    interpret = jax.devices()[0].platform == "cpu"
    x = jnp.arange(B, dtype=jnp.float32).reshape(R, C) / B
    y = jnp.flip(x, axis=1) + 0.1
    w = jnp.asarray(np.random.RandomState(0).randn(3, T), jnp.float32)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((R, C), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x, y, w)
    feats = np.stack([np.asarray(x).ravel(), np.asarray(y).ravel(),
                      (np.asarray(x) * np.asarray(y)).ravel()], axis=1)
    m = feats @ np.asarray(w)
    want = m.min(axis=1) + 0.001 * m.argmin(axis=1)
    got = np.asarray(out).ravel()
    err = np.abs(got - want).max()
    print(f"platform={jax.devices()[0].platform} interpret={interpret} "
          f"maxerr={err:.2e}")
    assert err < 1e-2, "MISMATCH"
    print("probe OK")


if __name__ == "__main__":
    main()
