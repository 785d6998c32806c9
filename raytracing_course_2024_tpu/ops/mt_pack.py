"""Moller-Trumbore as a matmul: per-triangle bilinear-form coefficients.

The MT quantities are ratios of scalar triple products, each BILINEAR in
the ray (o, d) (reference solve: src/geometry.rs:93-138; our VPU kernel:
ops/intersect.py:ray_triangle):

    det  = e1 . (d x e2)            =  d . (e2 x e1)
    udet = (o - p0) . (d x e2)      =  sum_ij eps_ijk e2_k o_i d_j  + d . (p0 x e2)
    vdet = d . ((o - p0) x e1)      = -sum_ij eps_ijk e1_k o_i d_j  - d . (p0 x e1)
    tdet = (o - p0) . (e1 x e2)     =  o . n - p0 . n,   n = e1 x e2

so with the 16-feature ray vector

    phi(o, d) = [o_i d_j (row-major, 9) | o (3) | d (3) | 1]

every triangle becomes a constant (16, 4) matrix W and

    [det, udet, vdet, tdet] = phi @ W      ->  u = udet/det, v = vdet/det,
                                               t = tdet/det

i.e. intersecting a block of rays against a block of triangles is ONE
matmul -- MXU work instead of ~60 VPU flops per (ray, triangle) pair. The
predicate (u >= 0, v >= 0, u+v <= 1, |det| > 1e-30, t > tmin) is identical
to ``ray_triangle``'s, so hits match the VPU kernel up to fp reassociation.

Precision: the bilinear expansion loses MT's subtract-first locality, so
rays MUST be translated into a frame where |o| is small (the caller
subtracts a per-treelet/scene centroid; W is built from centroid-local
vertices in f64 and stored f32). With local coords the products o_i d_j
stay O(scene-chunk size) and f32/HIGHEST-precision matmuls reproduce the
VPU kernel to ~1e-6 relative (pinned by tests/test_mt_pack.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .intersect import INF
from .vec import Vec3

PHI_DIM = 16
OUT_DIM = 4  # det, udet, vdet, tdet


def _cross_np(a, b):
    return np.cross(a, b)


def mt_w_matrices(p0: np.ndarray, p1: np.ndarray, p2: np.ndarray) -> np.ndarray:
    """(M, 3) f64 triangle vertices (already centroid-local) -> (M, 16, 4)
    f32 coefficient matrices. Degenerate (zero) triangles produce all-zero
    W -> det == 0 -> never valid, so padding rows are free."""
    p0 = np.asarray(p0, np.float64)
    e1 = np.asarray(p1, np.float64) - p0
    e2 = np.asarray(p2, np.float64) - p0
    m = p0.shape[0]
    n = _cross_np(e1, e2)

    w = np.zeros((m, PHI_DIM, OUT_DIM), np.float64)

    # eps_ijk contraction helper: products block row index = 3*i + j
    def eps_block(vk, col, sign):
        # sum_k eps_ijk vk_k at (i, j)
        # eps: (0,1,2)=+1 (1,2,0)=+1 (2,0,1)=+1 (0,2,1)=-1 (2,1,0)=-1 (1,0,2)=-1
        w[:, 3 * 0 + 1, col] += sign * vk[:, 2]
        w[:, 3 * 1 + 2, col] += sign * vk[:, 0]
        w[:, 3 * 2 + 0, col] += sign * vk[:, 1]
        w[:, 3 * 0 + 2, col] -= sign * vk[:, 1]
        w[:, 3 * 2 + 1, col] -= sign * vk[:, 0]
        w[:, 3 * 1 + 0, col] -= sign * vk[:, 2]

    O_O, O_D, O_C = 9, 12, 15  # offsets of the o, d, const feature rows

    # det = d . (e2 x e1)
    w[:, O_D : O_D + 3, 0] = _cross_np(e2, e1)
    # udet = eps(e2) products + d . (p0 x e2)
    eps_block(e2, 1, +1.0)
    w[:, O_D : O_D + 3, 1] = _cross_np(p0, e2)
    # vdet = -eps(e1) products - d . (p0 x e1)
    eps_block(e1, 2, -1.0)
    w[:, O_D : O_D + 3, 2] = -_cross_np(p0, e1)
    # tdet = o . n - p0 . n
    w[:, O_O : O_O + 3, 3] = n
    w[:, O_C, 3] = -np.einsum("mi,mi->m", p0, n)
    return w.astype(np.float32)


def mt_phi(ro: Vec3, rd: Vec3) -> jnp.ndarray:
    """(..., 16) feature vector [o (x) d | o | d | 1] for centroid-local
    rays. Built by stacking on the minor axis -- callers keeping rays as
    (B,) SoA get a (B, 16) array."""
    o = (ro.x, ro.y, ro.z)
    d = (rd.x, rd.y, rd.z)
    cols = [o[i] * d[j] for i in range(3) for j in range(3)]
    cols += [o[0], o[1], o[2], d[0], d[1], d[2], jnp.ones_like(o[0])]
    return jnp.stack(cols, axis=-1)


def mt_fold(out4: jnp.ndarray, tmin=0.0) -> tuple:
    """(..., 4) matmul output -> (t, valid) with ray_triangle's predicate.

    Split on the last axis; t = INF where invalid or t <= tmin."""
    det = out4[..., 0]
    inv_det = 1.0 / jnp.where(jnp.abs(det) > 1e-30, det, 1e-30)
    u = out4[..., 1] * inv_det
    v = out4[..., 2] * inv_det
    t = out4[..., 3] * inv_det
    valid = (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0) & (jnp.abs(det) > 1e-30)
    return jnp.where(valid & (t > tmin), t, INF), valid


def mt_eval(ro: Vec3, rd: Vec3, w: jnp.ndarray, tmin=0.0) -> jnp.ndarray:
    """Reference (XLA) evaluation: rays (B,) SoA x W (M, 16, 4) -> t (B, M)
    with INF misses. HIGHEST precision keeps full f32 through the MXU."""
    phi = mt_phi(ro, rd)  # (B, 16)
    out = jnp.einsum(
        "bi,mio->bmo", phi, w, precision=jax.lax.Precision.HIGHEST
    )
    t, _ = mt_fold(out, tmin)
    return t
