"""Native C++ BVH builder: output-identical to the NumPy builder, faster."""

import time

import numpy as np
import pytest

from raytracingrust_tpu import native
from raytracingrust_tpu.ops.bvh import _build_topology


def boxes(n, seed=0):
    rs = np.random.RandomState(seed)
    c = rs.randn(n, 3).astype(np.float32) * 10
    r = (rs.rand(n, 1).astype(np.float32) + 0.1)
    return c - r, c + r


@pytest.mark.skipif(not native.available(), reason="no C++ toolchain")
def test_native_matches_numpy():
    for n in (1, 2, 3, 7, 100, 1000):
        mins, maxs = boxes(n, seed=n)
        want = _build_topology(mins, maxs)
        got = native.native_build_topology(mins, maxs)
        assert got is not None
        for a, b, name in zip(
            got, want, ("node_min", "node_max", "prim", "hit", "miss", "depth")
        ):
            np.testing.assert_array_equal(a, b, err_msg=f"{name} (n={n})")


@pytest.mark.skipif(not native.available(), reason="no C++ toolchain")
def test_native_is_faster_at_scale():
    mins, maxs = boxes(30_000)  # the reference's largest BVH stress scene
    t0 = time.perf_counter()
    native.native_build_topology(mins, maxs)
    t_native = time.perf_counter() - t0
    t0 = time.perf_counter()
    _build_topology(mins, maxs)
    t_numpy = time.perf_counter() - t0
    assert t_native < t_numpy, (t_native, t_numpy)
