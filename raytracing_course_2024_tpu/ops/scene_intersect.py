"""Scene-level nearest-hit queries and surface shading data.

Two-phase design (TPU-first): a cheap *t-only* sweep finds the nearest
primitive per ray (dense over the SoA table, chunked through a ``lax.scan``
so peak memory is B x CHUNK regardless of scene size), then a *detail* pass
re-intersects only the winning primitive per ray to produce normals and
material data. The reference instead returns full ``Intersection`` structs
from every BVH leaf test (src/bvh.rs:264-277); recomputing details once per
ray is far cheaper than materializing them per candidate.

The dense sweep is the brute-force backend for small scenes (practice3 text
scenes, practice7_1's 36 triangles); ops.traverse supplies the BVH backend
for the 100k+ triangle scenes and reuses ``surface_detail`` unchanged.

Scene = unified finite table + infinite planes, combined exactly like the
reference's ``intersect_ray_with_scene`` (src/rendering.rs:201-226): nearest
BVH hit, then a linear scan over infinite planes keeping the closer one.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..scene.types import BOX, ELLIPSOID, SceneArrays, SceneStatics, TRI
from .intersect import (
    INF,
    box_normal,
    ellipsoid_normal,
    normal_to_world,
    ray_box_interval,
    ray_ellipsoid_interval,
    ray_plane_t,
    ray_triangle,
    to_local,
)
from .vec import Quat, Vec3, where3

DENSE_CHUNK = 1024  # prims per scan step in the dense sweep


class SceneHit(NamedTuple):
    t: jnp.ndarray  # (B,) f32, +inf on miss
    idx: jnp.ndarray  # (B,) i32 into finite table (or plane table)
    is_plane: jnp.ndarray  # (B,) bool
    valid: jnp.ndarray  # (B,) bool


class Surface(NamedTuple):
    """Shading data at a hit point (world space)."""

    t: jnp.ndarray
    point: Vec3  # EPS-backed-off hit point (src/rendering.rs:98)
    n_geom: Vec3  # geometric normal, flipped to face the ray
    n_shade: Vec3  # shading normal, flipped to face the ray
    is_outer: jnp.ndarray  # bool: ray entered from outside
    color: Vec3
    metallic: jnp.ndarray
    roughness: jnp.ndarray
    emission: Vec3
    ior: jnp.ndarray
    mkind: jnp.ndarray  # i32 material kind


def _v3(arr: jnp.ndarray) -> Vec3:
    return Vec3(arr[..., 0], arr[..., 1], arr[..., 2])


def _q4(arr: jnp.ndarray) -> Quat:
    return Quat(arr[..., 0], arr[..., 1], arr[..., 2], arr[..., 3])


def _expand(v: Vec3) -> Vec3:
    """(B,) components -> (B, 1) for broadcasting against (K,) prim axes."""
    return Vec3(v.x[:, None], v.y[:, None], v.z[:, None])


_GEOM_FIELDS = ("ptype", "p0", "p1", "p2", "position", "rotation")


def _prim_ts(ro_b: Vec3, rd_b: Vec3, geom: dict, statics: SceneStatics,
             tmin) -> jnp.ndarray:
    """t matrix (B, K) for one chunk of the finite table; inf = miss.

    Picks the nearest *strictly > tmin* root, replicating the reference's
    first-of-all-points semantics (src/geometry.rs:51-58, 170-189)."""
    ro = ro_b
    rd = rd_b
    if statics.any_rotation:
        pos = _v3(geom["position"])
        rot = _q4(geom["rotation"])
        ro, rd = to_local(ro, rd, pos, rot, True)
    elif statics.any_nontri:
        pos = _v3(geom["position"])
        ro = ro - pos

    t_tri, _, _, v_tri = ray_triangle(
        ro_b, rd_b, _v3(geom["p0"]), _v3(geom["p1"]), _v3(geom["p2"])
    )
    t = jnp.where(v_tri & (t_tri > tmin), t_tri, INF)

    if statics.any_nontri:
        ptype = geom["ptype"]
        s = _v3(geom["p0"])
        ib = ray_box_interval(ro, rd, s)
        ie = ray_ellipsoid_interval(ro, rd, s)

        def nearest_pos(iv):
            t1 = jnp.where(iv.valid & (iv.t1 > tmin), iv.t1, INF)
            t2 = jnp.where(iv.valid & (iv.t2 > tmin), iv.t2, INF)
            return jnp.minimum(t1, t2)

        t = jnp.where(ptype == BOX, nearest_pos(ib), t)
        t = jnp.where(ptype == ELLIPSOID, nearest_pos(ie), t)
    return t


def nearest_hit_dense(
    ro: Vec3, rd: Vec3, scn: SceneArrays, statics: SceneStatics, tmin=0.0
) -> SceneHit:
    """Brute-force nearest hit over the finite table + planes."""
    n = scn.ptype.shape[0]
    ro_b = _expand(ro)
    rd_b = _expand(rd)
    geom = {f: getattr(scn, f) for f in _GEOM_FIELDS}

    if n <= DENSE_CHUNK:
        t_mat = _prim_ts(ro_b, rd_b, geom, statics, tmin)
        best_idx = jnp.argmin(t_mat, axis=1).astype(jnp.int32)
        best_t = jnp.min(t_mat, axis=1)
    else:
        num_chunks = -(-n // DENSE_CHUNK)
        pad = num_chunks * DENSE_CHUNK - n

        def padded(a):
            widths = [(0, pad)] + [(0, 0)] * (a.ndim - 1)
            return jnp.pad(a, widths).reshape((num_chunks, DENSE_CHUNK) + a.shape[1:])

        chunked = {f: padded(a) for f, a in geom.items()}

        def body(carry, chunk):
            best_t, best_idx, ci = carry
            t_mat = _prim_ts(ro_b, rd_b, chunk, statics, tmin)
            loc = jnp.argmin(t_mat, axis=1).astype(jnp.int32)
            tloc = jnp.min(t_mat, axis=1)
            take = tloc < best_t
            best_idx = jnp.where(take, ci * DENSE_CHUNK + loc, best_idx)
            best_t = jnp.minimum(best_t, tloc)
            return (best_t, best_idx, ci + 1), None

        b = ro.x.shape[0]
        init = (
            jnp.full((b,), INF),
            jnp.zeros((b,), jnp.int32),
            jnp.int32(0),
        )
        (best_t, best_idx, _), _ = jax.lax.scan(body, init, chunked)

    hit = SceneHit(best_t, best_idx, jnp.zeros_like(best_idx, bool), jnp.isfinite(best_t))
    if statics.num_planes > 0:
        hit = _fold_in_planes(ro, rd, scn, hit, tmin)
    return hit


def _fold_in_planes(ro: Vec3, rd: Vec3, scn: SceneArrays, hit: SceneHit, tmin) -> SceneHit:
    """Linear scan over infinite planes (src/rendering.rs:215-224)."""
    ro_b = _expand(ro)
    rd_b = _expand(rd)
    pos = _v3(scn.pl_position)
    rot = _q4(scn.pl_rotation)
    o, d = to_local(ro_b, rd_b, pos, rot, True)
    t, v = ray_plane_t(o, d, _v3(scn.pl_normal))
    t = jnp.where(v & (t > tmin) & scn.pl_mask, t, INF)  # (B, P)
    pidx = jnp.argmin(t, axis=1).astype(jnp.int32)
    pt = jnp.min(t, axis=1)
    closer = pt < hit.t
    return SceneHit(
        jnp.minimum(hit.t, pt),
        jnp.where(closer, pidx, hit.idx),
        jnp.where(closer, True, hit.is_plane),
        hit.valid | jnp.isfinite(pt),
    )


def surface_detail(
    ro: Vec3,
    rd: Vec3,
    hit: SceneHit,
    scn: SceneArrays,
    statics: SceneStatics,
    tmin=0.0,
    eps_backoff: float = 1e-4,
) -> Surface:
    """Re-intersect the winning primitive per ray to get normals + material.

    Normal orientation matches the reference: geometric and shading normals
    are flipped to face the incoming ray (src/geometry.rs:114-126 triangles;
    src/geometry.rs:170-189 box entry/exit)."""
    idx = jnp.clip(hit.idx, 0, scn.ptype.shape[0] - 1)
    g = lambda a: a[idx]  # gather (B, ...) from finite table

    p0 = _v3(g(scn.p0))
    rot = _q4(g(scn.rotation))
    pos = _v3(g(scn.position))
    o, d = to_local(ro, rd, pos, rot, statics.any_rotation)

    # --- triangle branch ---------------------------------------------------
    a, b, c = p0, _v3(g(scn.p1)), _v3(g(scn.p2))
    t_tri, u, v, _ = ray_triangle(ro, rd, a, b, c)
    flat_n = (b - a).cross(c - a).normalize()
    tri_front = flat_n.dot(rd) < 0.0
    sn0, sn1, sn2 = _v3(g(scn.sn0)), _v3(g(scn.sn1)), _v3(g(scn.sn2))
    ns = (sn0 + (sn1 - sn0) * u + (sn2 - sn0) * v).normalize()
    sign_tri = jnp.where(tri_front, 1.0, -1.0)
    tri_ng = flat_n * sign_tri
    tri_ns = ns * sign_tri
    n_geom, n_shade, is_outer, t_best = tri_ng, tri_ns, tri_front, t_tri

    if statics.any_nontri:
        ptype = g(scn.ptype)
        # --- box ---
        ib = ray_box_interval(o, d, p0)
        box_outer = ib.valid & (ib.t1 > tmin)
        t_box = jnp.where(box_outer, ib.t1, ib.t2)
        p_loc = o + d * t_box
        bn = box_normal(p_loc, p0)
        bn = where3(box_outer, bn, -bn)
        bn = normal_to_world(bn, rot, statics.any_rotation)
        # --- ellipsoid ---
        ie = ray_ellipsoid_interval(o, d, p0)
        ell_outer = ie.valid & (ie.t1 > tmin)
        t_ell = jnp.where(ell_outer, ie.t1, ie.t2)
        p_ell = o + d * t_ell
        en = ellipsoid_normal(p_ell, p0)
        en = where3(ell_outer, en, -en)
        en = normal_to_world(en, rot, statics.any_rotation)

        is_box = ptype == BOX
        is_ell = ptype == ELLIPSOID
        t_best = jnp.where(is_box, t_box, jnp.where(is_ell, t_ell, t_tri))
        n_geom = where3(is_box, bn, where3(is_ell, en, tri_ng))
        n_shade = where3(is_box, bn, where3(is_ell, en, tri_ns))
        is_outer = jnp.where(
            is_box, box_outer, jnp.where(is_ell, ell_outer, tri_front)
        )

    color = _v3(g(scn.color))
    metallic = g(scn.metallic)
    roughness = g(scn.roughness)
    emission = _v3(g(scn.emission))
    ior = g(scn.ior)
    mkind = g(scn.mkind)

    if statics.num_planes > 0:
        pidx = jnp.clip(hit.idx, 0, scn.pl_normal.shape[0] - 1)
        gp = lambda arr: arr[pidx]
        prot = _q4(gp(scn.pl_rotation))
        ppos = _v3(gp(scn.pl_position))
        po, pd = to_local(ro, rd, ppos, prot, True)
        pn_local = _v3(gp(scn.pl_normal))
        pt, _ = ray_plane_t(po, pd, pn_local)
        pn_world = normal_to_world(pn_local.normalize(), prot, True)
        p_front = pn_world.dot(rd) < 0.0
        pn = pn_world * jnp.where(p_front, 1.0, -1.0)

        ip = hit.is_plane
        t_best = jnp.where(ip, pt, t_best)
        n_geom = where3(ip, pn, n_geom)
        n_shade = where3(ip, pn, n_shade)
        is_outer = jnp.where(ip, p_front, is_outer)
        color = where3(ip, _v3(gp(scn.pl_color)), color)
        metallic = jnp.where(ip, gp(scn.pl_metallic), metallic)
        roughness = jnp.where(ip, gp(scn.pl_roughness), roughness)
        emission = where3(ip, _v3(gp(scn.pl_emission)), emission)
        ior = jnp.where(ip, gp(scn.pl_ior), ior)
        mkind = jnp.where(ip, gp(scn.pl_mkind), mkind)

    t_final = jnp.where(hit.valid, hit.t, t_best)
    point = ro + rd * (t_final - eps_backoff)
    return Surface(
        t=t_final,
        point=point,
        n_geom=n_geom,
        n_shade=n_shade,
        is_outer=is_outer,
        color=color,
        metallic=metallic,
        roughness=roughness,
        emission=emission,
        ior=ior,
        mkind=mkind,
    )
