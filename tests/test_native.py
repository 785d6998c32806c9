"""Native C++ BVH builder: compiles, matches the numpy oracle's invariants,
and is substantially faster on large inputs."""

import time

import numpy as np
import pytest

from raytracing_course_2024_tpu.ops.bvh import build_bvh, validate_bvh


def _boxes(rng, n):
    lo = rng.uniform(-100, 100, (n, 3))
    hi = lo + rng.uniform(0.01, 2.0, (n, 3))
    return lo, hi


@pytest.fixture(scope="module")
def native():
    try:
        from raytracing_course_2024_tpu.native import load_native, native_build_bvh

        load_native()
        return native_build_bvh
    except Exception as e:  # noqa: BLE001
        pytest.skip(f"native builder unavailable: {e}")


def test_native_build_valid(native, rng):
    amin, amax = _boxes(rng, 5000)
    bvh = native(amin, amax, 4, 16)
    validate_bvh(bvh, amin, amax)


def test_native_handles_degenerate(native, rng):
    # all centroids identical -> median splits all the way down
    amin = np.zeros((300, 3))
    amax = np.ones((300, 3))
    bvh = native(amin, amax, 4, 16)
    validate_bvh(bvh, amin, amax)


def test_native_quality_comparable(native, rng):
    """SAH cost of the native tree within 15% of the numpy oracle's."""
    amin, amax = _boxes(rng, 20000)

    def sah_cost(bvh):
        d = np.maximum(bvh.node_max - bvh.node_min, 0)
        area = d[:, 0] * d[:, 1] + d[:, 1] * d[:, 2] + d[:, 2] * d[:, 0]
        leaf = bvh.node_is_leaf
        return (area[leaf] * bvh.node_right[leaf]).sum() + area[~leaf].sum() * 0.25

    c_native = sah_cost(native(amin, amax, 4, 16))
    c_numpy = sah_cost(build_bvh(amin, amax))
    assert c_native < 1.15 * c_numpy, (c_native, c_numpy)


def test_native_speed(native, rng):
    amin, amax = _boxes(rng, 100_000)
    t0 = time.perf_counter()
    native(amin, amax, 4, 16)
    dt_native = time.perf_counter() - t0
    assert dt_native < 3.0, f"native build too slow: {dt_native:.2f}s"
