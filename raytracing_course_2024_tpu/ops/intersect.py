"""Ray-primitive intersection kernels, fully vectorized.

Replaces the reference's per-ray scalar kernels (src/geometry.rs:51-251) with
broadcastable jnp math over ``Vec3`` structs-of-arrays: every function accepts
arbitrary mutually-broadcastable component shapes, so the same kernel serves

* the dense pass: rays ``(B, 1)`` x primitives ``(1, N)`` -> ``(B, N)``,
* the gathered pass: one primitive per ray, everything ``(B,)``,
* BVH leaf tests: ``(B, LEAF)``.

Parity notes vs the reference:
* triangle: the 3x3-inverse solve (src/geometry.rs:93-138) is algebraically
  Moller-Trumbore; we implement MT directly (u >= 0, v >= 0, u+v <= 1,
  t > tmin).
* box: slab test with the same direction bias (src/geometry.rs:144-155 adds
  ``0.001*EPS`` to each direction component) and face-normal reconstruction
  by EPS compare (src/geometry.rs:161-169).
* ellipsoid and plane kernels serve the text-format scenes the reference HEAD
  dropped (SURVEY.md section 2.2).
* world->local: translate then rotate by the conjugate quaternion
  (src/geometry.rs:196-223); geometric normals rotated back to world.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from .vec import Quat, Vec3, where3

INF = float("inf")  # python float: no device-array creation at import time
EPS = 1e-4  # f32 retune of reference EPS=1e-5 (src/geometry.rs:49)
DIR_BIAS = 1e-9  # reference uses 0.001*EPS = 1e-8 in f64 (src/geometry.rs:145)


class Interval(NamedTuple):
    """Entry/exit parameters of a ray vs a closed shape (2 roots max)."""

    t1: jnp.ndarray
    t2: jnp.ndarray
    valid: jnp.ndarray  # interval exists (t1 <= t2 for slabs; disc >= 0)


# ---------------------------------------------------------------------------
# local-frame shape kernels
# ---------------------------------------------------------------------------


def ray_box_interval(ro: Vec3, rd: Vec3, s: Vec3) -> Interval:
    """Centered box with half-extents s (reference src/geometry.rs:140-159)."""
    inv = Vec3(
        1.0 / (rd.x + DIR_BIAS), 1.0 / (rd.y + DIR_BIAS), 1.0 / (rd.z + DIR_BIAS)
    )
    ax = (-s.x - ro.x) * inv.x
    bx = (s.x - ro.x) * inv.x
    ay = (-s.y - ro.y) * inv.y
    by = (s.y - ro.y) * inv.y
    az = (-s.z - ro.z) * inv.z
    bz = (s.z - ro.z) * inv.z
    t1 = jnp.maximum(
        jnp.minimum(ax, bx), jnp.maximum(jnp.minimum(ay, by), jnp.minimum(az, bz))
    )
    t2 = jnp.minimum(
        jnp.maximum(ax, bx), jnp.minimum(jnp.maximum(ay, by), jnp.maximum(az, bz))
    )
    return Interval(t1, t2, t1 <= t2)


def ray_aabb(ro: Vec3, rd: Vec3, bmin: Vec3, bmax: Vec3) -> Interval:
    """Slab test against a min/max AABB (BVH traversal; the reference wraps
    the AABB as a Box object instead -- src/bvh.rs:157-166)."""
    center = (bmin + bmax) * 0.5
    half = (bmax - bmin) * 0.5
    return ray_box_interval(ro - center, rd, half)


def box_normal(p_local: Vec3, s: Vec3, eps: float = EPS) -> Vec3:
    """Face normal from a point on the box surface, reference's EPS-compare
    chain (src/geometry.rs:161-169)."""
    on_x = (s.x - jnp.abs(p_local.x)) < eps
    on_y = (s.y - jnp.abs(p_local.y)) < eps
    zero = jnp.zeros_like(p_local.x)
    nx = Vec3(jnp.sign(p_local.x), zero, zero)
    ny = Vec3(zero, jnp.sign(p_local.y), zero)
    nz = Vec3(zero, zero, jnp.sign(p_local.z))
    return where3(on_x, nx, where3(on_y, ny, nz))


def ray_ellipsoid_interval(ro: Vec3, rd: Vec3, r: Vec3) -> Interval:
    """Axis-aligned ellipsoid |p/r| = 1 in the local frame (text scenes;
    absent from reference HEAD, required by its inputs)."""
    o = ro.div(r)
    d = rd.div(r)
    a = d.dot(d)
    b = o.dot(d)
    c = o.dot(o) - 1.0
    disc = b * b - a * c
    valid = disc >= 0.0
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    inv_a = 1.0 / jnp.maximum(a, 1e-30)
    return Interval((-b - sq) * inv_a, (-b + sq) * inv_a, valid)


def ellipsoid_normal(p_local: Vec3, r: Vec3) -> Vec3:
    """Outward normal at a surface point: normalize(p / r^2)."""
    return Vec3(
        p_local.x / (r.x * r.x), p_local.y / (r.y * r.y), p_local.z / (r.z * r.z)
    ).normalize()


def ray_triangle(ro: Vec3, rd: Vec3, a: Vec3, b: Vec3, c: Vec3):
    """Moller-Trumbore. Returns (t, u, v, valid_geom) where valid_geom is the
    barycentric containment test only; range checks (t > tmin) are the
    caller's. Matches the reference solve (src/geometry.rs:93-138):
    u >= 0, v >= 0, u + v <= 1."""
    e1 = b - a
    e2 = c - a
    pv = rd.cross(e2)
    det = e1.dot(pv)
    inv_det = 1.0 / jnp.where(jnp.abs(det) > 1e-30, det, 1e-30)
    tv = ro - a
    u = tv.dot(pv) * inv_det
    qv = tv.cross(e1)
    v = rd.dot(qv) * inv_det
    t = e2.dot(qv) * inv_det
    valid = (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0) & (jnp.abs(det) > 1e-30)
    return t, u, v, valid


def ray_plane_t(ro: Vec3, rd: Vec3, n: Vec3):
    """Plane through the local origin with normal n. Returns (t, valid)."""
    denom = n.dot(rd)
    t = -n.dot(ro) / jnp.where(jnp.abs(denom) > 1e-30, denom, 1e-30)
    return t, jnp.abs(denom) > 1e-30


# ---------------------------------------------------------------------------
# world<->local transforms (src/geometry.rs:196-223)
# ---------------------------------------------------------------------------


def to_local(ro: Vec3, rd: Vec3, pos: Vec3, rot: Quat, rotated: bool):
    """Transform a world ray into a primitive's local frame. ``rotated`` is a
    trace-time python bool: glTF scenes bake transforms into vertices, so the
    quaternion math compiles away entirely for them."""
    o = ro - pos
    if rotated:
        o = rot.inverse_rotate(o)
        d = rot.inverse_rotate(rd)
    else:
        d = rd
    return o, d


def normal_to_world(n_local: Vec3, rot: Quat, rotated: bool) -> Vec3:
    return rot.rotate(n_local) if rotated else n_local
