"""Importance-sampling distributions + one-sample MIS mixture.

Reference: src/distributions.rs. The estimator is the reference's exactly:
a uniform pick among {cosine-weighted, GGX-VNDF, light-surface} components
(MixDistribution, distributions.rs:187-202), with the mixture pdf = average
of component pdfs, and the *light* pdf evaluated geometrically along the
sampled ray -- summed over every light-primitive hit (distributions.rs:
160-184) -- rather than with shadow rays. TPU-first changes:

* counter-based threefry keys replace the per-row Xoshiro stream
  (src/rendering.rs:50-51);
* the all-hits light-BVH walk becomes a dense sweep over the (small) light
  table: identical sum, no divergent traversal;
* the unbounded rejection loop (src/rendering.rs:102-110) becomes a bounded
  ``lax.while_loop`` (max_tries); rays that never find pdf > 0 are killed --
  statistically negligible and lane-convergent (SURVEY.md section 7 hard
  part 3);
* ellipsoid lights (text scenes) use the uniform-sphere pullback pdf
  1/(4 pi |J|), |J| = sqrt((u_x r_y r_z)^2 + (r_x u_y r_z)^2 + (r_x r_y u_z)^2).
"""

from __future__ import annotations

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..scene.types import BOX, ELLIPSOID, SceneArrays, SceneStatics, TRI
from .intersect import (
    normal_to_world,
    ray_box_interval,
    ray_ellipsoid_interval,
    ray_triangle,
    to_local,
)
from .scene_intersect import _expand, _q4, _v3
from .vec import Quat, Vec3, reflect, where3

PI = math.pi
_SAFE = 1e-9

# the reference's fixed tangent-frame seed vector (distributions.rs:265)
_T_SEED = Vec3(
    jnp.float32(0.234 / 1.0), jnp.float32(0.1234), jnp.float32(0.97686)
)


def tangent_frame(n: Vec3):
    """Orthonormal (t1, t2, n) built exactly like the reference
    (distributions.rs:265-267): t1 = normalize(n x seed), t2 = normalize(n x t1)."""
    seed = _T_SEED.normalize()
    seed = Vec3(
        jnp.broadcast_to(seed.x, n.x.shape),
        jnp.broadcast_to(seed.y, n.x.shape),
        jnp.broadcast_to(seed.z, n.x.shape),
    )
    t1 = n.cross(seed).normalize()
    t2 = n.cross(t1).normalize()
    return t1, t2


def to_frame_local(t1: Vec3, t2: Vec3, n: Vec3, v: Vec3) -> Vec3:
    """World -> tangent-local coordinates (m^T v)."""
    return Vec3(v.dot(t1), v.dot(t2), v.dot(n))


def from_frame_local(t1: Vec3, t2: Vec3, n: Vec3, v: Vec3) -> Vec3:
    """Tangent-local -> world (m v)."""
    return t1 * v.x + t2 * v.y + n * v.z


# ---------------------------------------------------------------------------
# cosine-weighted hemisphere (distributions.rs:53-68)
# ---------------------------------------------------------------------------


def sample_cosine(key: jax.Array, n: Vec3) -> Vec3:
    g = jax.random.normal(key, (3,) + n.x.shape, jnp.float32)
    u = Vec3(g[0], g[1], g[2]).normalize()
    return (u + n).normalize(eps=1e-12)


def pdf_cosine(n: Vec3, l: Vec3) -> jnp.ndarray:
    return jnp.maximum(0.0, l.dot(n)) / PI


# ---------------------------------------------------------------------------
# GGX visible-NDF (Heitz) (distributions.rs:204-298)
# ---------------------------------------------------------------------------


def _sample_ggx_vndf_local(key: jax.Array, v_local: Vec3, alpha: jnp.ndarray) -> Vec3:
    u = jax.random.uniform(key, (2,) + v_local.x.shape, jnp.float32)
    vh = Vec3(alpha * v_local.x, alpha * v_local.y, v_local.z).normalize(eps=1e-20)
    lensq = vh.x * vh.x + vh.y * vh.y
    inv_len = jax.lax.rsqrt(jnp.maximum(lensq, 1e-20))
    has_xy = lensq > 1e-20
    t1 = where3(
        has_xy,
        Vec3(-vh.y * inv_len, vh.x * inv_len, jnp.zeros_like(vh.x)),
        Vec3(jnp.ones_like(vh.x), jnp.zeros_like(vh.x), jnp.zeros_like(vh.x)),
    )
    t2 = vh.cross(t1)
    r = jnp.sqrt(u[0])
    phi = 2.0 * PI * u[1]
    p1 = r * jnp.cos(phi)
    p2 = r * jnp.sin(phi)
    s = 0.5 * (1.0 + vh.z)
    p2 = (1.0 - s) * jnp.sqrt(jnp.maximum(0.0, 1.0 - p1 * p1)) + s * p2
    nh = t1 * p1 + t2 * p2 + vh * jnp.sqrt(jnp.maximum(0.0, 1.0 - p1 * p1 - p2 * p2))
    ne = Vec3(alpha * nh.x, alpha * nh.y, jnp.maximum(0.0, nh.z)).normalize(eps=1e-20)
    return ne


def sample_vndf(key: jax.Array, n: Vec3, v: Vec3, roughness: jnp.ndarray) -> Vec3:
    alpha = roughness * roughness
    t1, t2 = tangent_frame(n)
    v_local = to_frame_local(t1, t2, n, v)
    ne_local = _sample_ggx_vndf_local(key, v_local, alpha)
    ne = from_frame_local(t1, t2, n, ne_local)
    return reflect(v, ne)


def _ggx_d_local(m: Vec3, alpha: jnp.ndarray) -> jnp.ndarray:
    """Anisotropic-form GGX D in tangent-local coords (distributions.rs:245-252)."""
    a2 = alpha * alpha
    q = (m.x * m.x + m.y * m.y) / jnp.maximum(a2, 1e-20) + m.z * m.z
    return 1.0 / jnp.maximum(PI * a2 * q * q, 1e-20)


def _g1_local(v: Vec3, alpha: jnp.ndarray) -> jnp.ndarray:
    """Smith G1 in tangent-local coords (distributions.rs:236-243)."""
    z2 = jnp.maximum(v.z * v.z, 1e-20)
    under = 1.0 + alpha * alpha * (v.x * v.x + v.y * v.y) / z2
    lam = 0.5 * (jnp.sqrt(under) - 1.0)
    return 1.0 / (1.0 + lam)


def pdf_vndf(n: Vec3, l: Vec3, v: Vec3, roughness: jnp.ndarray) -> jnp.ndarray:
    """D_v(h) / (4 v.h), everything in the tangent frame
    (distributions.rs:255-260, 276-297)."""
    alpha = roughness * roughness
    t1, t2 = tangent_frame(n)
    vl = to_frame_local(t1, t2, n, v)
    ll = to_frame_local(t1, t2, n, l)
    h = (vl + ll).normalize(eps=1e-20)
    dv = (
        _g1_local(vl, alpha)
        * jnp.maximum(0.0, vl.dot(h))
        * _ggx_d_local(h, alpha)
        / jnp.where(jnp.abs(vl.z) > _SAFE, vl.z, _SAFE)
    )
    denom = 4.0 * vl.dot(h)
    pdf = dv / jnp.where(jnp.abs(denom) > _SAFE, denom, _SAFE)
    # h must be in the upper hemisphere: GGX D is symmetric in +-z, but the
    # sampler clamps Ne.z >= 0 (distributions.rs:232), so below-horizon half
    # vectors have zero true density -- without this the pdf integrates > 1.
    return jnp.where((vl.z > 0.0) & (denom > 0.0) & (h.z > 0.0), pdf, 0.0)


# ---------------------------------------------------------------------------
# light-surface sampling (distributions.rs:83-184)
# ---------------------------------------------------------------------------


class _LightGather(NamedTuple):
    ptype: jnp.ndarray
    p0: Vec3
    p1: Vec3
    p2: Vec3
    pos: Vec3
    rot: Quat


def _gather_light(scn: SceneArrays, li: jnp.ndarray) -> _LightGather:
    idx = scn.light_idx[li]
    return _LightGather(
        ptype=scn.ptype[idx],
        p0=_v3(scn.p0[idx]),
        p1=_v3(scn.p1[idx]),
        p2=_v3(scn.p2[idx]),
        pos=_v3(scn.position[idx]),
        rot=_q4(scn.rotation[idx]),
    )


def sample_light_dir(
    key: jax.Array, point: Vec3, scn: SceneArrays, statics: SceneStatics
) -> Vec3:
    """Uniformly pick one emissive primitive, area-sample a surface point,
    return the unit direction from ``point`` toward it
    (distributions.rs:84-125, 151-158)."""
    b = point.x.shape[0]
    k_pick, k_u = jax.random.split(key)
    li = jax.random.randint(k_pick, (b,), 0, statics.num_lights)
    lg = _gather_light(scn, li)
    u = jax.random.uniform(k_u, (5, b), jnp.float32)

    # --- box face sampling (distributions.rs:86-110) ---
    s = lg.p0
    wx = 4.0 * s.y * s.z
    wy = 4.0 * s.x * s.z
    wz = 4.0 * s.x * s.y
    w = wx + wy + wz
    x = u[0] * w
    sign = jnp.where(u[1] < 0.5, 1.0, -1.0)
    cu = (u[2] * 2.0 - 1.0)
    cv = (u[3] * 2.0 - 1.0)
    on_x = x < wx
    on_y = (~on_x) & (x < wx + wy)
    box_pt = where3(
        on_x,
        Vec3(s.x * sign, cu * s.y, cv * s.z),
        where3(
            on_y,
            Vec3(cu * s.x, s.y * sign, cv * s.z),
            Vec3(cu * s.x, cv * s.y, s.z * sign),
        ),
    )

    # --- triangle sampling with uv folding (distributions.rs:111-119) ---
    tu, tv = u[0], u[1]
    fold = tu + tv >= 1.0
    tu = jnp.where(fold, 1.0 - tu, tu)
    tv = jnp.where(fold, 1.0 - tv, tv)
    tri_pt = lg.p0 + (lg.p1 - lg.p0) * tu + (lg.p2 - lg.p0) * tv

    # --- ellipsoid: uniform unit sphere scaled by radii ---
    g = jax.random.normal(jax.random.fold_in(key, 7), (3, b), jnp.float32)
    sph = Vec3(g[0], g[1], g[2]).normalize(eps=1e-20)
    ell_pt = Vec3(sph.x * s.x, sph.y * s.y, sph.z * s.z)

    local = where3(
        lg.ptype == BOX, box_pt, where3(lg.ptype == ELLIPSOID, ell_pt, tri_pt)
    )
    world = lg.rot.rotate(local) + lg.pos
    return (world - point).normalize(eps=1e-20)


def pdf_lights(
    point: Vec3, l: Vec3, scn: SceneArrays, statics: SceneStatics
) -> jnp.ndarray:
    """Mixture-light pdf: for the ray (point, l), sum the area->solid-angle
    converted pdf over EVERY light-primitive intersection, divided by the
    light count (distributions.rs:127-148, 160-184). Dense over the light
    table (B, L); both roots of closed shapes contribute."""
    li = scn.light_idx  # (L,)
    ptype = scn.ptype[li]
    p0 = _v3(scn.p0[li])
    p1 = _v3(scn.p1[li])
    p2 = _v3(scn.p2[li])
    pos = _v3(scn.position[li])
    rot = _q4(scn.rotation[li])
    inv_area = scn.light_inv_area
    mask = scn.light_mask

    ro = _expand(point)  # (B, 1)
    rd = _expand(l)
    o, d = to_local(ro, rd, pos, rot, statics.any_rotation)

    def contrib(t, n_world_dot_l, local_pdf, valid):
        t2 = t * t
        denom = jnp.maximum(jnp.abs(n_world_dot_l), _SAFE)
        c = local_pdf * t2 / denom
        return jnp.where(valid & (t > 0.0) & mask, c, 0.0)

    total = jnp.zeros(point.x.shape + (li.shape[0],), jnp.float32)

    # triangles: single hit, |n.l| with the unit flat normal
    t_tri, _, _, v_tri = ray_triangle(ro, rd, p0, p1, p2)
    tri_n = (p1 - p0).cross(p2 - p0).normalize(eps=1e-20)
    total += contrib(t_tri, tri_n.dot(rd), inv_area, v_tri & (ptype == TRI))

    if statics.any_nontri:
        # boxes: both roots, face normals
        ib = ray_box_interval(o, d, p0)
        from .intersect import box_normal, ellipsoid_normal

        for t_root in (ib.t1, ib.t2):
            p_loc = o + d * t_root
            n_loc = box_normal(p_loc, p0)
            n_w = normal_to_world(n_loc, rot, statics.any_rotation)
            total += contrib(t_root, n_w.dot(rd), inv_area, ib.valid & (ptype == BOX))

        # ellipsoids: both roots, pullback pdf 1/(4 pi |J|)
        ie = ray_ellipsoid_interval(o, d, p0)
        for t_root in (ie.t1, ie.t2):
            p_loc = o + d * t_root
            n_loc = ellipsoid_normal(p_loc, p0)
            n_w = normal_to_world(n_loc, rot, statics.any_rotation)
            usph = p_loc.div(p0)  # unit-sphere point
            jac = jnp.sqrt(
                jnp.maximum(
                    (usph.x * p0.y * p0.z) ** 2
                    + (p0.x * usph.y * p0.z) ** 2
                    + (p0.x * p0.y * usph.z) ** 2,
                    1e-20,
                )
            )
            local_pdf = inv_area / jac  # inv_area = 1/(4 pi) for ellipsoids
            total += contrib(
                t_root, n_w.dot(rd), local_pdf, ie.valid & (ptype == ELLIPSOID)
            )

    return jnp.sum(total, axis=-1) / statics.num_lights


# ---------------------------------------------------------------------------
# one-sample MIS mixture with bounded rejection (rendering.rs:102-110,
# distributions.rs:187-202)
# ---------------------------------------------------------------------------


def sample_mixture(
    key: jax.Array,
    point: Vec3,
    n_geom: Vec3,
    n_shade: Vec3,
    v: Vec3,
    roughness: jnp.ndarray,
    scn: SceneArrays,
    statics: SceneStatics,
    need: jnp.ndarray,
    max_tries: int = 8,
):
    """Returns (l Vec3, pdf (B,), ok (B,)).

    Rejection contract per the reference: resample until pdf > 0 and
    l . n_shade > 0 (rendering.rs:102-110); here bounded by ``max_tries``,
    after which the lane reports ok=False and the path is killed.
    ``need`` masks lanes that actually require a sample (alive, non-delta
    material) so converged batches exit early.
    """
    n_comp = 3 if statics.num_lights > 0 else 2
    b = point.x.shape[0]
    # derive init values from traced inputs so their device-varying type
    # matches the loop body outputs under shard_map (jax >= 0.9 pvary rules)
    zero = point.x * 0.0

    def mixture_pdf(l: Vec3) -> jnp.ndarray:
        p = pdf_cosine(n_geom, l) + pdf_vndf(n_geom, l, v, roughness)
        if statics.num_lights > 0:
            p = p + pdf_lights(point, l, scn, statics)
        return p / n_comp

    def draw(k) -> Vec3:
        k_pick, k_cos, k_vndf, k_light = jax.random.split(k, 4)
        which = jax.random.randint(k_pick, (b,), 0, n_comp)
        l = sample_cosine(k_cos, n_geom)
        l_v = sample_vndf(k_vndf, n_geom, v, roughness)
        l = where3(which == 1, l_v, l)
        if statics.num_lights > 0:
            l_l = sample_light_dir(k_light, point, scn, statics)
            l = where3(which == 2, l_l, l)
        return l

    def cond(carry):
        i, _, _, _, accepted = carry
        return (i < max_tries) & jnp.any(need & ~accepted)

    def body(carry):
        i, k, l, pdf, accepted = carry
        k, sub = jax.random.split(k)
        cand = draw(sub)
        cand_pdf = mixture_pdf(cand)
        ok = (cand_pdf > _SAFE) & (cand.dot(n_shade) > 0.0)
        take = ~accepted & ok
        l = where3(take, cand, l)
        pdf = jnp.where(take, cand_pdf, pdf)
        return (i + 1, k, l, pdf, accepted | ok)

    init = (
        jnp.int32(0),
        key,
        Vec3(zero, zero, zero + 1.0),
        zero + 1.0,
        ~need,  # lanes that don't need a sample count as done
    )
    _, _, l, pdf, accepted = jax.lax.while_loop(cond, body, init)
    return l, pdf, accepted & need
