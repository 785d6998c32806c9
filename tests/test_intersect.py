"""Analytic intersection-kernel tests (reference src/geometry.rs semantics)."""

import jax.numpy as jnp
import numpy as np

from raytracing_course_2024_tpu.ops.intersect import (
    box_normal,
    ellipsoid_normal,
    ray_aabb,
    ray_box_interval,
    ray_ellipsoid_interval,
    ray_plane_t,
    ray_triangle,
)
from raytracing_course_2024_tpu.ops.vec import Quat, Vec3, quat_mul, reflect


def v3(*args):
    a = np.array(args, np.float32).reshape(-1, 3)
    return Vec3(jnp.asarray(a[:, 0]), jnp.asarray(a[:, 1]), jnp.asarray(a[:, 2]))


def test_ray_box():
    ro = v3(0, 0, -5)
    rd = v3(0, 0, 1)
    iv = ray_box_interval(ro, rd, v3(1, 2, 3))
    assert iv.valid[0]
    assert np.isclose(iv.t1[0], 2.0, atol=1e-5)
    assert np.isclose(iv.t2[0], 8.0, atol=1e-5)
    # miss
    iv = ray_box_interval(v3(0, 5, -5), rd, v3(1, 2, 3))
    assert not iv.valid[0]
    # inside: t1 < 0 < t2
    iv = ray_box_interval(v3(0, 0, 0), rd, v3(1, 2, 3))
    assert iv.valid[0] and iv.t1[0] < 0 < iv.t2[0]


def test_box_normal_faces():
    s = v3(1, 2, 3)
    assert np.allclose(
        box_normal(v3(1.0, 0.5, 0.5), s).to_array(), [[1, 0, 0]], atol=1e-6
    )
    assert np.allclose(
        box_normal(v3(-0.2, -2.0, 0.5), s).to_array(), [[0, -1, 0]], atol=1e-6
    )
    assert np.allclose(
        box_normal(v3(0.2, 0.5, 3.0), s).to_array(), [[0, 0, 1]], atol=1e-6
    )


def test_ray_ellipsoid():
    ro = v3(0, 0, -5)
    rd = v3(0, 0, 1)
    iv = ray_ellipsoid_interval(ro, rd, v3(1, 1, 2))
    assert iv.valid[0]
    assert np.isclose(iv.t1[0], 3.0, atol=1e-5)
    assert np.isclose(iv.t2[0], 7.0, atol=1e-5)
    n = ellipsoid_normal(v3(0, 0, -2), v3(1, 1, 2))
    assert np.allclose(n.to_array(), [[0, 0, -1]], atol=1e-6)
    # unit sphere normal = position
    n = ellipsoid_normal(v3(0.6, 0.8, 0.0), v3(1, 1, 1))
    assert np.allclose(n.to_array(), [[0.6, 0.8, 0.0]], atol=1e-6)


def test_ray_triangle_hit_and_barycentrics():
    a, b, c = v3(0, 0, 0), v3(2, 0, 0), v3(0, 2, 0)
    ro = v3(0.5, 0.5, -3)
    rd = v3(0, 0, 1)
    t, u, v, ok = ray_triangle(ro, rd, a, b, c)
    assert ok[0]
    assert np.isclose(t[0], 3.0, atol=1e-5)
    assert np.isclose(u[0], 0.25, atol=1e-5)
    assert np.isclose(v[0], 0.25, atol=1e-5)
    # outside
    _, _, _, ok = ray_triangle(v3(3, 3, -3), rd, a, b, c)
    assert not ok[0]
    # parallel (degenerate det)
    _, _, _, ok = ray_triangle(v3(0.5, 0.5, -3), v3(1, 0, 0), a, b, c)
    assert not ok[0]


def test_ray_plane():
    t, ok = ray_plane_t(v3(0, 3, 0), v3(0, -1, 0), v3(0, 1, 0))
    assert ok[0] and np.isclose(t[0], 3.0, atol=1e-6)
    t, ok = ray_plane_t(v3(0, 3, 0), v3(1, 0, 0), v3(0, 1, 0))
    assert not ok[0]


def test_ray_aabb_matches_box():
    ro = v3(-4, 0.5, 0.5)
    rd = v3(1, 0, 0)
    iv = ray_aabb(ro, rd, v3(-1, 0, 0), v3(2, 1, 1))
    assert iv.valid[0]
    assert np.isclose(iv.t1[0], 3.0, atol=1e-5)
    assert np.isclose(iv.t2[0], 6.0, atol=1e-5)


def test_reflect():
    v = v3(1, 1, 0).normalize()
    n = v3(0, 1, 0)
    r = reflect(v, n)
    assert np.allclose(r.to_array(), v3(-1, 1, 0).normalize().to_array(), atol=1e-6)


def test_quaternion_roundtrip(rng):
    q_raw = rng.normal(size=4)
    q_raw /= np.linalg.norm(q_raw)
    q = Quat(*[jnp.float32(x) for x in q_raw])
    v = v3(*rng.normal(size=3))
    w = q.rotate(v)
    back = q.inverse_rotate(w)
    assert np.allclose(back.to_array(), v.to_array(), atol=1e-5)
    # norm preserved
    assert np.isclose(float(w.norm()[0]), float(v.norm()[0]), atol=1e-5)


def test_quat_mul_composition(rng):
    a_raw = rng.normal(size=4)
    a_raw /= np.linalg.norm(a_raw)
    b_raw = rng.normal(size=4)
    b_raw /= np.linalg.norm(b_raw)
    qa = Quat(*[jnp.float32(x) for x in a_raw])
    qb = Quat(*[jnp.float32(x) for x in b_raw])
    v = v3(*rng.normal(size=3))
    lhs = quat_mul(qa, qb).rotate(v)
    rhs = qa.rotate(qb.rotate(v))
    assert np.allclose(lhs.to_array(), rhs.to_array(), atol=1e-5)
