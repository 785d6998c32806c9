"""MT-as-matmul (ops/mt_pack.py) vs the VPU ray_triangle kernel."""

import jax.numpy as jnp
import numpy as np

from raytracing_course_2024_tpu.ops.intersect import ray_triangle
from raytracing_course_2024_tpu.ops.mt_pack import (
    mt_eval,
    mt_fold,
    mt_phi,
    mt_w_matrices,
)
from raytracing_course_2024_tpu.ops.vec import Vec3


def _soup(rng, m, spread=4.0, size=0.5):
    c = rng.uniform(-spread, spread, (m, 3))
    p0 = c + rng.uniform(-size, size, (m, 3))
    p1 = c + rng.uniform(-size, size, (m, 3))
    p2 = c + rng.uniform(-size, size, (m, 3))
    return p0, p1, p2


def _rays(rng, b, spread=6.0):
    o = rng.uniform(-spread, spread, (b, 3))
    d = rng.normal(size=(b, 3))
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return o, d


def test_matches_ray_triangle():
    rng = np.random.default_rng(0)
    m, b = 257, 4096
    p0, p1, p2 = _soup(rng, m)
    o, d = _rays(rng, b)
    centroid = (p0 + p1 + p2).mean(axis=0) / 3.0

    w = jnp.asarray(mt_w_matrices(p0 - centroid, p1 - centroid, p2 - centroid))
    ro = Vec3(*[jnp.asarray((o - centroid)[:, i], jnp.float32) for i in range(3)])
    rd = Vec3(*[jnp.asarray(d[:, i], jnp.float32) for i in range(3)])
    t_mm = np.asarray(mt_eval(ro, rd, w))  # (B, M)

    rob = Vec3(*[c[:, None] for c in ro])
    rdb = Vec3(*[c[:, None] for c in rd])
    a = Vec3(*[jnp.asarray((p0 - centroid)[:, i], jnp.float32)[None, :] for i in range(3)])
    bb = Vec3(*[jnp.asarray((p1 - centroid)[:, i], jnp.float32)[None, :] for i in range(3)])
    cc = Vec3(*[jnp.asarray((p2 - centroid)[:, i], jnp.float32)[None, :] for i in range(3)])
    t_ref, _, _, valid = ray_triangle(rob, rdb, a, bb, cc)
    t_ref = np.asarray(jnp.where(valid & (t_ref > 0.0), t_ref, jnp.inf))

    hit_mm = np.isfinite(t_mm)
    hit_ref = np.isfinite(t_ref)
    # identical predicate up to fp reassociation: edge-grazing pairs may
    # flip, everything else must agree
    disagree = hit_mm != hit_ref
    assert disagree.mean() < 1e-4, disagree.mean()
    both = hit_mm & hit_ref
    assert np.allclose(t_mm[both], t_ref[both], rtol=2e-5, atol=2e-5)


def test_degenerate_padding_rows_never_hit():
    rng = np.random.default_rng(1)
    w = mt_w_matrices(np.zeros((5, 3)), np.zeros((5, 3)), np.zeros((5, 3)))
    assert (w == 0).all()
    o, d = _rays(rng, 64)
    ro = Vec3(*[jnp.asarray(o[:, i], jnp.float32) for i in range(3)])
    rd = Vec3(*[jnp.asarray(d[:, i], jnp.float32) for i in range(3)])
    t = np.asarray(mt_eval(ro, rd, jnp.asarray(w)))
    assert not np.isfinite(t).any()


def test_phi_fold_shapes():
    rng = np.random.default_rng(2)
    o, d = _rays(rng, 33)
    ro = Vec3(*[jnp.asarray(o[:, i], jnp.float32) for i in range(3)])
    rd = Vec3(*[jnp.asarray(d[:, i], jnp.float32) for i in range(3)])
    phi = mt_phi(ro, rd)
    assert phi.shape == (33, 16)
    assert np.allclose(np.asarray(phi[:, 15]), 1.0)
    t, valid = mt_fold(jnp.zeros((33, 7, 4)))
    assert t.shape == (33, 7) and valid.shape == (33, 7)
    assert not np.isfinite(np.asarray(t)).any()
