"""Pallas TPU megakernel: one FULL path-tracing bounce in a single kernel.

A small scene's bounce spans ~40 XLA fusions (intersect kernel, detail
gathers, sampling kernel, pdf, brdf, state updates), each one an HBM
round-trip of (B,) intermediates. This kernel runs the ENTIRE bounce body
of the integrator (integrator/path.py:_bounce) per 8192-ray block inside
VMEM:

1. nearest-hit intersect over the whole (small) primitive table -- a
   STATICALLY UNROLLED loop over the unified geo table, emitting
   type-specialized code per primitive (triangle Moller-Trumbore, box
   slab, ellipsoid quadratic, infinite plane; quaternion world->local only
   for the primitives that are actually rotated) and tracking the winner's
   (t, index, u, v, signed normal, outerness) in registers;
2. surface detail: the winner's shading normals + material come from
   statically-unrolled compare-select chains over the (C_GEO, M) table
   (a one-hot MXU dot_general was tried first and made the Mosaic compile
   explode; M <= 128 keeps the chains cheap VPU work);
3. emission / background accumulation into the radiance carry;
4. the full MIS mixture sampling stage (shared body with
   ops/pallas_sampling; TPU hardware PRNG);
5. continuation: glTF metallic-roughness BRDF + cos/pdf weight for
   sampled lobes, and the delta rules (MIRROR perfect reflection,
   DIELECTRIC Fresnel-split reflect/refract with interior transmission
   offset) -- all select-chained, with the delta code emitted only when
   the static spec contains delta materials.

Scope: any scene whose finite-primitive + plane count fits MAX_PRIMS=128
(statics.mega_spec non-empty) -- the whole dense family: the practice3
text scenes (analytic prims, mirrors, dielectrics) and the practice7
headline scenes (small glTF meshes). Big BVH scenes keep the modular
kernels. The reference evaluates the same bounce as one inlined call tree
(src/rendering.rs:86-127); this is its TPU equivalent.

``final_only`` runs sections 1-3 only (the integrator's last depth level
collects emission and dies -- src/rendering.rs:93-95), fusing the batch
engine's epilogue into the same kernel.

RNG: per (bounce, block) hardware-PRNG streams; statistically equivalent
to the XLA threefry path but a different stream, like the sampler kernel.
For scenes WITHOUT dielectrics the draw sequence is identical to the
round-3 kernel (the dielectric split draw is only emitted when the spec
has dielectrics), so all-triangle TPU goldens are unaffected.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..scene.types import BOX, DIELECTRIC, ELLIPSOID, MIRROR, TRI
from ..scene.types import SceneArrays, SceneStatics
from .brdf import eval_brdf
from .intersect import DIR_BIAS, EPS
from .pallas_intersect import MAX_PRIMS, cast_to_vma, vma_union
from .pallas_sampling import make_unif, mixture_body
from .sampling import UNROLL_MAX_LIGHTS
from .vec import Vec3, reflect, where3

BLK = 8192  # the hardware-PRNG reshape only lowers at this block shape
EPS_BACKOFF = 1e-4  # src/rendering.rs:98 via ops/scene_intersect.py
PLANE_KIND = 3  # mega_spec kind id for infinite planes

# unified geo+attr table rows (C_GEO, M): finite prims then real planes
_A = 0  # 0-2: tri vert a | box half-extents | ellipsoid radii | plane normal
_E1 = 3  # 3-5 tri edge 1 (p1 - p0)
_E2 = 6  # 6-8 tri edge 2 (p2 - p0)
_POS = 9  # 9-11
_ROT = 12  # 12-15 quaternion xyzw
_SN0 = 16  # 16-24 shading normals (triangles)
_SN1 = 19
_SN2 = 22
_COLOR = 25
_METAL = 28
_ROUGH = 29
_EMIT = 30  # 30-32
_IOR = 33
_MKIND = 34
C_GEO = 35


def build_geo_rows(scn: SceneArrays, statics: SceneStatics) -> jnp.ndarray:
    """(C_GEO, M) f32 unified geometry+attribute table: finite primitives
    followed by the real (unpadded) planes, matching statics.mega_spec."""

    def cols3(a):
        return [a[:, 0], a[:, 1], a[:, 2]]

    def cols4(a):
        return [a[:, 0], a[:, 1], a[:, 2], a[:, 3]]

    e1 = scn.p1 - scn.p0  # tri edges; unused junk for box/ellipsoid rows
    e2 = scn.p2 - scn.p0
    rows = (
        cols3(scn.p0) + cols3(e1) + cols3(e2)
        + cols3(scn.position) + cols4(scn.rotation)
        + cols3(scn.sn0) + cols3(scn.sn1) + cols3(scn.sn2)
        + cols3(scn.color) + [scn.metallic, scn.roughness]
        + cols3(scn.emission) + [scn.ior, scn.mkind.astype(jnp.float32)]
    )
    geo = jnp.stack(rows)
    assert geo.shape[0] == C_GEO
    # build_scene_arrays pads prim arrays to >=1 row when num_prims == 0;
    # statics.mega_spec has no entry for that padding, so slice to the real
    # count or every plane entry reads the previous column's geometry.
    geo = geo[:, : statics.num_prims]
    n_pl = statics.num_planes
    if n_pl:
        sl = slice(0, n_pl)
        z = jnp.zeros((n_pl,), jnp.float32)
        prows = (
            cols3(scn.pl_normal[sl]) + [z] * 6
            + cols3(scn.pl_position[sl]) + cols4(scn.pl_rotation[sl])
            + [z] * 9
            + cols3(scn.pl_color[sl])
            + [scn.pl_metallic[sl], scn.pl_roughness[sl]]
            + cols3(scn.pl_emission[sl])
            + [scn.pl_ior[sl], scn.pl_mkind[sl].astype(jnp.float32)]
        )
        geo = jnp.concatenate([geo, jnp.stack(prows)], axis=1)
    return geo


def _quat_rotate(qx, qy, qz, qw, v: Vec3) -> Vec3:
    """Rotate per-lane Vec3 by a scalar quaternion (xyzw): v + 2w(q x v) +
    2 q x (q x v) -- same math as ops/vec.py Quat.rotate."""
    tx = 2.0 * (qy * v.z - qz * v.y)
    ty = 2.0 * (qz * v.x - qx * v.z)
    tz = 2.0 * (qx * v.y - qy * v.x)
    return Vec3(
        v.x + qw * tx + (qy * tz - qz * ty),
        v.y + qw * ty + (qz * tx - qx * tz),
        v.z + qw * tz + (qx * ty - qy * tx),
    )


def _intersect_all(spec: tuple, geo, ro: Vec3, rd: Vec3):
    """Statically-unrolled nearest-hit over the unified geo table.

    Returns (best_t, best_i, best_u, best_v, n_geom, is_outer, is_tri):
    ``n_geom`` is the winner's geometric normal flipped to face the ray
    (normalized), ``is_outer`` the reference's entry-side flag per shape
    (src/geometry.rs:114-126 triangles, 170-189 box entry/exit)."""
    zero = ro.x * 0.0
    best_t = zero + jnp.inf
    best_i = jnp.zeros_like(zero, jnp.int32)
    best_u = zero
    best_v = zero
    bnx, bny, bnz = zero, zero, zero + 1.0
    best_outer = zero > -1.0  # True
    best_tri = zero

    for i, (kind, rotated, _mk) in enumerate(spec):
        if kind == TRI:
            # rotations are baked into triangle vertices at build time
            # (scene/build.py), so MT runs in world space
            e1x, e1y, e1z = geo[_E1, i], geo[_E1 + 1, i], geo[_E1 + 2, i]
            e2x, e2y, e2z = geo[_E2, i], geo[_E2 + 1, i], geo[_E2 + 2, i]
            pvx = rd.y * e2z - rd.z * e2y
            pvy = rd.z * e2x - rd.x * e2z
            pvz = rd.x * e2y - rd.y * e2x
            det = e1x * pvx + e1y * pvy + e1z * pvz
            inv_det = 1.0 / jnp.where(jnp.abs(det) > 1e-30, det, 1e-30)
            tvx = ro.x - geo[_A, i]
            tvy = ro.y - geo[_A + 1, i]
            tvz = ro.z - geo[_A + 2, i]
            u = (tvx * pvx + tvy * pvy + tvz * pvz) * inv_det
            qvx = tvy * e1z - tvz * e1y
            qvy = tvz * e1x - tvx * e1z
            qvz = tvx * e1y - tvy * e1x
            v = (rd.x * qvx + rd.y * qvy + rd.z * qvz) * inv_det
            t = (e2x * qvx + e2y * qvy + e2z * qvz) * inv_det
            ok = (
                (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
                & (jnp.abs(det) > 1e-30) & (t > 0.0)
            )
            # flat normal e1 x e2: per-prim scalar constants
            fnx = e1y * e2z - e1z * e2y
            fny = e1z * e2x - e1x * e2z
            fnz = e1x * e2y - e1y * e2x
            front = (fnx * rd.x + fny * rd.y + fnz * rd.z) < 0.0
            sgn = jnp.where(front, 1.0, -1.0)
            cnx, cny, cnz = fnx * sgn, fny * sgn, fnz * sgn
            outer = front
            istri = 1.0
        else:
            px, py, pz = geo[_POS, i], geo[_POS + 1, i], geo[_POS + 2, i]
            o = Vec3(ro.x - px, ro.y - py, ro.z - pz)
            d = rd
            if rotated:
                qx, qy, qz, qw = (
                    geo[_ROT, i], geo[_ROT + 1, i], geo[_ROT + 2, i],
                    geo[_ROT + 3, i],
                )
                # world -> local: rotate by the conjugate
                o = _quat_rotate(-qx, -qy, -qz, qw, o)
                d = _quat_rotate(-qx, -qy, -qz, qw, rd)
            ax_, ay_, az_ = geo[_A, i], geo[_A + 1, i], geo[_A + 2, i]

            if kind == BOX:
                ivx = 1.0 / (d.x + DIR_BIAS)
                ivy = 1.0 / (d.y + DIR_BIAS)
                ivz = 1.0 / (d.z + DIR_BIAS)
                lox, hix = (-ax_ - o.x) * ivx, (ax_ - o.x) * ivx
                loy, hiy = (-ay_ - o.y) * ivy, (ay_ - o.y) * ivy
                loz, hiz = (-az_ - o.z) * ivz, (az_ - o.z) * ivz
                t1 = jnp.maximum(
                    jnp.minimum(lox, hix),
                    jnp.maximum(jnp.minimum(loy, hiy), jnp.minimum(loz, hiz)),
                )
                t2 = jnp.minimum(
                    jnp.maximum(lox, hix),
                    jnp.minimum(jnp.maximum(loy, hiy), jnp.maximum(loz, hiz)),
                )
                valid = t1 <= t2
                outer = valid & (t1 > 0.0)
                t = jnp.where(outer, t1, t2)
                ok = valid & (t > 0.0)
                # face normal by EPS compare (src/geometry.rs:161-169)
                hx = o.x + d.x * t
                hy = o.y + d.y * t
                hz = o.z + d.z * t
                on_x = (ax_ - jnp.abs(hx)) < EPS
                on_y = (ay_ - jnp.abs(hy)) < EPS
                cnx = jnp.where(on_x, jnp.sign(hx), 0.0)
                cny = jnp.where(~on_x & on_y, jnp.sign(hy), 0.0)
                cnz = jnp.where(~on_x & ~on_y, jnp.sign(hz), 0.0)
                flip = jnp.where(outer, 1.0, -1.0)
                cn = Vec3(cnx * flip, cny * flip, cnz * flip)
            elif kind == ELLIPSOID:
                iox, ioy, ioz = o.x / ax_, o.y / ay_, o.z / az_
                idx_, idy, idz = d.x / ax_, d.y / ay_, d.z / az_
                a_q = idx_ * idx_ + idy * idy + idz * idz
                b_q = iox * idx_ + ioy * idy + ioz * idz
                c_q = iox * iox + ioy * ioy + ioz * ioz - 1.0
                disc = b_q * b_q - a_q * c_q
                valid = disc >= 0.0
                sq = jnp.sqrt(jnp.maximum(disc, 0.0))
                inv_a = 1.0 / jnp.maximum(a_q, 1e-30)
                t1 = (-b_q - sq) * inv_a
                t2 = (-b_q + sq) * inv_a
                outer = valid & (t1 > 0.0)
                t = jnp.where(outer, t1, t2)
                ok = valid & (t > 0.0)
                hx = o.x + d.x * t
                hy = o.y + d.y * t
                hz = o.z + d.z * t
                flip = jnp.where(outer, 1.0, -1.0)
                cn = Vec3(
                    hx / (ax_ * ax_) * flip,
                    hy / (ay_ * ay_) * flip,
                    hz / (az_ * az_) * flip,
                )
            else:  # PLANE_KIND
                denom = ax_ * d.x + ay_ * d.y + az_ * d.z
                num = ax_ * o.x + ay_ * o.y + az_ * o.z
                t = -num / jnp.where(jnp.abs(denom) > 1e-30, denom, 1e-30)
                ok = (jnp.abs(denom) > 1e-30) & (t > 0.0)
                outer = denom < 0.0  # front-facing: normal opposes the ray
                flip = jnp.where(outer, 1.0, -1.0)
                cn = Vec3(ax_ * flip, ay_ * flip, az_ * flip)

            if rotated:
                cn = _quat_rotate(qx, qy, qz, qw, cn)
            cnx, cny, cnz = cn.x, cn.y, cn.z
            u = zero
            v = zero
            istri = 0.0

        take = ok & (t < best_t)
        best_t = jnp.where(take, t, best_t)
        best_i = jnp.where(take, i, best_i)
        best_u = jnp.where(take, u, best_u)
        best_v = jnp.where(take, v, best_v)
        bnx = jnp.where(take, cnx, bnx)
        bny = jnp.where(take, cny, bny)
        bnz = jnp.where(take, cnz, bnz)
        # NB: jnp.where on i1 operands does not lower on real Mosaic
        # ("Unsupported target bitwidth for truncation", i8->i1 trunci --
        # found on hardware round 5; interpret mode accepts it). Pure
        # logical ops select between bool vectors fine.
        best_outer = (take & outer) | (~take & best_outer)
        best_tri = jnp.where(take, istri, best_tri)

    n_geom = Vec3(bnx, bny, bnz).normalize()
    return best_t, best_i, best_u, best_v, n_geom, best_outer, best_tri


def _bounce_math(statics, spec, k_tries, bg, unif, geo, lp_ref,
                 ro, rd, thr, rad, alive, final_only: bool = False):
    """Sections 1-5 of the fused bounce (intersect -> detail -> emission ->
    sampling -> continuation), shared by the per-bounce megakernel and the
    persistent sticky kernel. Returns (point, l, thr', rad', alive') with
    ``alive'`` = survived-this-bounce (no depth rule applied).
    ``final_only`` stops after emission (the integrator epilogue)."""
    n = len(spec)
    zero3 = Vec3(ro.x * 0.0, ro.x * 0.0, ro.x * 0.0)

    # --- 1. nearest hit over the unrolled geo table ------------------------
    best_t, best_i, best_u, best_v, n_geom, is_outer, is_tri = (
        _intersect_all(spec, geo, ro, rd)
    )
    hit = jnp.isfinite(best_t)

    # --- 2. surface detail: winner attributes via unrolled select chains ---
    # (a one-hot (BLK, M) @ (M, C) dot_general was tried first; its tiny
    # non-128-aligned contraction made the Mosaic compile explode. M is
    # <= MAX_PRIMS=128 here, so per-attribute compare-select chains are
    # cheap VPU work and the scalar table reads fold to immediates.)
    def gather_row(row):
        out = geo[row, 0] + ro.x * 0.0
        for i in range(1, n):
            out = jnp.where(best_i == i, geo[row, i], out)
        return out

    def a3(base):
        return Vec3(gather_row(base), gather_row(base + 1),
                    gather_row(base + 2))

    any_tri = any(k == TRI for k, _, _ in spec)
    if any_tri:
        sgn = jnp.where(is_outer, 1.0, -1.0)
        sn0, sn1, sn2 = a3(_SN0), a3(_SN1), a3(_SN2)
        ns = (
            sn0 + (sn1 - sn0) * best_u + (sn2 - sn0) * best_v
        ).normalize() * sgn
        n_shade = where3(is_tri > 0.5, ns, n_geom)
    else:
        n_shade = n_geom
    t_safe = jnp.where(hit, best_t, 1.0)
    point = ro + rd * (t_safe - EPS_BACKOFF)
    emission = a3(_EMIT)

    # --- 3. emission / background ------------------------------------------
    bgv = Vec3(
        jnp.full_like(ro.x, bg[0]),
        jnp.full_like(ro.x, bg[1]),
        jnp.full_like(ro.x, bg[2]),
    )
    miss = alive & ~hit
    on_hit = alive & hit
    rad = rad + where3(
        miss, thr.mul(bgv), where3(on_hit, thr.mul(emission), zero3)
    )
    alive = on_hit
    if final_only:
        return point, rd, thr, rad, alive

    color = a3(_COLOR)
    metallic = gather_row(_METAL)
    roughness = gather_row(_ROUGH)
    mkind = gather_row(_MKIND).astype(jnp.int32)

    # --- 4. mixture sampling -----------------------------------------------
    v_dir = rd * -1.0
    lp = lp_ref[:, :] if statics.num_lights > 0 else None
    l, pdf, ok = mixture_body(
        unif, point, n_geom, n_shade, v_dir, roughness, lp, statics, k_tries
    )

    # --- 5. continuation: BRDF weight + delta rules + state update ---------
    f = eval_brdf(l, n_geom, v_dir, color, metallic, roughness, mkind)
    cos_l = jnp.maximum(l.dot(n_geom), 0.0)
    # clamp like integrator/path.py _finish_bounce: a zero pdf on a
    # surviving sampled lane must not inject inf/NaN throughput
    w = f * (cos_l / jnp.maximum(pdf, 1e-20))

    any_mirror = any(m == MIRROR for _, _, m in spec)
    any_diel = any(m == DIELECTRIC for _, _, m in spec)
    next_origin = point
    if any_mirror or any_diel:
        # delta continuation rules, same math as integrator/path.py
        # _finish_bounce (MIRROR perfect reflection; DIELECTRIC Fresnel
        # split with Schlick, TIR fallback, interior transmission offset)
        l_mirror = reflect(v_dir, n_geom)
        is_mirror = mkind == MIRROR
        is_diel = mkind == DIELECTRIC
        is_delta = is_mirror | is_diel
        if any_mirror:
            l = where3(is_mirror, l_mirror, l)
            w = where3(is_mirror, color, w)
        if any_diel:
            ior = gather_row(_IOR)
            u_diel = unif()
            cos_i = jnp.clip(v_dir.dot(n_geom), 0.0, 1.0)
            eta = jnp.where(is_outer, 1.0 / ior, ior)
            sin2_t = eta * eta * jnp.maximum(0.0, 1.0 - cos_i * cos_i)
            tir = sin2_t > 1.0
            cos_t = jnp.sqrt(jnp.maximum(0.0, 1.0 - sin2_t))
            r0 = jnp.square((eta - 1.0) / (eta + 1.0))
            refl_p = r0 + (1.0 - r0) * jnp.power(1.0 - cos_i, 5.0)
            do_reflect = tir | (u_diel < refl_p)
            l_refr = (
                rd * eta + n_geom * (eta * cos_i - cos_t)
            ).normalize(eps=1e-20)
            l_diel = where3(do_reflect, l_mirror, l_refr)
            one3 = Vec3(
                jnp.ones_like(ro.x), jnp.ones_like(ro.x), jnp.ones_like(ro.x)
            )
            w_diel = where3(do_reflect | ~is_outer, one3, color)
            l = where3(is_diel, l_diel, l)
            w = where3(is_diel, w_diel, w)
            # transmitted rays continue from just PAST the surface
            # (src/rendering.rs:98 backs scattered rays off on the
            # incoming side; see integrator/path.py _finish_bounce)
            transmitted = is_diel & ~do_reflect
            point_back = ro + rd * (t_safe + 1e-4)
            next_origin = where3(transmitted, point_back, point)
        new_alive = alive & (is_delta | ok)
    else:
        new_alive = alive & ok

    thr = thr.mul(where3(new_alive, w, zero3))
    return next_origin, l, thr, rad, new_alive


def _kernel(statics: SceneStatics, spec: tuple, k_tries: int, bg: tuple,
            final_only: bool,
            seed_ref,
            rox, roy, roz, rdx, rdy, rdz,
            tx, ty, tz, radx, rady, radz, aliv,
            geo, lp_ref,
            o_rox, o_roy, o_roz, o_rdx, o_rdy, o_rdz,
            o_tx, o_ty, o_tz, o_radx, o_rady, o_radz, o_aliv):
    pltpu.prng_seed(seed_ref[0] + pl.program_id(0) * jnp.int32(-1640531527))
    unif = make_unif(BLK)

    ro = Vec3(rox[:], roy[:], roz[:])
    rd = Vec3(rdx[:], rdy[:], rdz[:])
    thr = Vec3(tx[:], ty[:], tz[:])
    rad = Vec3(radx[:], rady[:], radz[:])
    alive = aliv[:] > 0.5

    point, l, thr, rad, new_alive = _bounce_math(
        statics, spec, k_tries, bg, unif, geo, lp_ref,
        ro, rd, thr, rad, alive, final_only=final_only,
    )

    o_rox[:] = point.x
    o_roy[:] = point.y
    o_roz[:] = point.z
    o_rdx[:] = l.x
    o_rdy[:] = l.y
    o_rdz[:] = l.z
    o_tx[:] = thr.x
    o_ty[:] = thr.y
    o_tz[:] = thr.z
    o_radx[:] = rad.x
    o_rady[:] = rad.y
    o_radz[:] = rad.z
    o_aliv[:] = new_alive.astype(jnp.float32)


@functools.partial(
    jax.jit,
    static_argnames=("statics", "k_tries", "bg", "final_only", "interpret"),
)
def _run(seed, state13, geo, lp, statics, k_tries, bg, final_only,
         interpret):
    b = state13[0].shape[0]
    vma = vma_union(seed, *state13, geo, lp)
    seed = cast_to_vma(seed, vma)
    geo = cast_to_vma(geo, vma)
    lp = cast_to_vma(lp, vma)
    state13 = tuple(cast_to_vma(c, vma) for c in state13)
    grid = (b // BLK,)
    ray_spec = pl.BlockSpec((BLK,), lambda i: (i,), memory_space=pltpu.VMEM)
    in_specs = (
        [pl.BlockSpec((1,), lambda i: (0,), memory_space=pltpu.SMEM)]
        + [ray_spec] * 13
        + [
            pl.BlockSpec(geo.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(lp.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
        ]
    )
    out = pl.pallas_call(
        functools.partial(_kernel, statics, statics.mega_spec, k_tries, bg,
                          final_only),
        grid=grid,
        in_specs=in_specs,
        out_specs=[ray_spec] * 13,
        out_shape=[
            jax.ShapeDtypeStruct((b,), jnp.float32, vma=vma) for _ in range(13)
        ],
        interpret=pltpu.InterpretParams() if interpret else False,
    )(seed, *state13, geo, lp)
    return out


# camera row layout for the persistent kernel: (1, 128) f32 VMEM
_CAM_POS = 0  # 0-2 position
_CAM_RIGHT = 3  # 3-5
_CAM_UP = 6  # 6-8
_CAM_FWD = 9  # 9-11
_CAM_TANX = 12
_CAM_TANY = 13


def pack_camera_row(cam) -> jnp.ndarray:
    """CameraArrays -> (1, 128) f32 operand row for the persistent kernel."""
    row = jnp.zeros((128,), jnp.float32)
    row = row.at[0:3].set(cam.position)
    row = row.at[3:6].set(cam.right)
    row = row.at[6:9].set(cam.up)
    row = row.at[9:12].set(cam.forward)
    row = row.at[12].set(cam.tan_half_fov_x)
    row = row.at[13].set(cam.tan_half_fov_y)
    return row[None, :]


def _primary_kernel(statics: SceneStatics, spec: tuple, k_tries: int,
                    bg: tuple, width: int, height: int,
                    seed_ref, cam_ref, px_ref, py_ref, geo, lp_ref,
                    o_rox, o_roy, o_roz, o_rdx, o_rdy, o_rdz,
                    o_tx, o_ty, o_tz, o_radx, o_rady, o_radz, o_aliv):
    """Camera jitter + the FIRST full bounce in one kernel (the batch
    engine's bounce 0): the XLA generate_rays fusion (threefry jitter
    sweep + NDC math) folds into the same VMEM pass as the intersect.
    Camera math matches ops/camera.py generate_rays_u exactly; jitter
    draws come from the kernel PRNG stream (drawn BEFORE the sampling
    stage's draws)."""
    pltpu.prng_seed(seed_ref[0] + pl.program_id(0) * jnp.int32(-1640531527))
    unif = make_unif(BLK)

    zero = px_ref[:] * 0.0
    u0, u1 = unif(), unif()
    sx = (2.0 * (px_ref[:] + u0) / width - 1.0) * cam_ref[0, _CAM_TANX]
    sy = -(2.0 * (py_ref[:] + u1) / height - 1.0) * cam_ref[0, _CAM_TANY]

    def axis(i):
        return (
            sx * cam_ref[0, _CAM_RIGHT + i]
            + sy * cam_ref[0, _CAM_UP + i]
            + cam_ref[0, _CAM_FWD + i]
        )

    rd = Vec3(axis(0), axis(1), axis(2)).normalize()
    ro = Vec3(zero + cam_ref[0, _CAM_POS], zero + cam_ref[0, _CAM_POS + 1],
              zero + cam_ref[0, _CAM_POS + 2])
    one = zero + 1.0
    thr = Vec3(one, one, one)
    rad = Vec3(zero, zero, zero)
    alive = zero < 1.0  # all lanes start a fresh path

    point, l, thr, rad, new_alive = _bounce_math(
        statics, spec, k_tries, bg, unif, geo, lp_ref,
        ro, rd, thr, rad, alive,
    )

    o_rox[:] = point.x
    o_roy[:] = point.y
    o_roz[:] = point.z
    o_rdx[:] = l.x
    o_rdy[:] = l.y
    o_rdz[:] = l.z
    o_tx[:] = thr.x
    o_ty[:] = thr.y
    o_tz[:] = thr.z
    o_radx[:] = rad.x
    o_rady[:] = rad.y
    o_radz[:] = rad.z
    o_aliv[:] = new_alive.astype(jnp.float32)


@functools.partial(
    jax.jit,
    static_argnames=("statics", "k_tries", "bg", "width", "height",
                     "interpret"),
)
def _run_primary(seed, cam_row, px, py, geo, lp, statics, k_tries, bg,
                 width, height, interpret):
    b = px.shape[0]
    vma = vma_union(seed, cam_row, px, py, geo, lp)
    seed = cast_to_vma(seed, vma)
    cam_row = cast_to_vma(cam_row, vma)
    px = cast_to_vma(px, vma)
    py = cast_to_vma(py, vma)
    geo = cast_to_vma(geo, vma)
    lp = cast_to_vma(lp, vma)
    grid = (b // BLK,)
    ray_spec = pl.BlockSpec((BLK,), lambda i: (i,), memory_space=pltpu.VMEM)
    in_specs = [
        pl.BlockSpec((1,), lambda i: (0,), memory_space=pltpu.SMEM),
        pl.BlockSpec((1, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ray_spec,
        ray_spec,
        pl.BlockSpec(geo.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec(lp.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
    ]
    out = pl.pallas_call(
        functools.partial(_primary_kernel, statics, statics.mega_spec,
                          k_tries, bg, width, height),
        grid=grid,
        in_specs=in_specs,
        out_specs=[ray_spec] * 13,
        out_shape=[
            jax.ShapeDtypeStruct((b,), jnp.float32, vma=vma)
            for _ in range(13)
        ],
        interpret=pltpu.InterpretParams() if interpret else False,
    )(seed, cam_row, px, py, geo, lp)
    return out


def primary_bounce_pallas(
    key: jax.Array,
    pix_x: jnp.ndarray,
    pix_y: jnp.ndarray,
    cam,
    scn: SceneArrays,
    statics: SceneStatics,
    bg: tuple,
    max_tries: int,
    width: int,
    height: int,
    geo: jnp.ndarray | None = None,
):
    """Camera-fused bounce 0: returns (ro', rd', thr, rad, alive) for a
    fresh path per lane through pixel (pix_x, pix_y)."""
    b = pix_x.shape[0]
    pad = (-b) % BLK
    px = pix_x.astype(jnp.float32)
    py = pix_y.astype(jnp.float32)
    if pad:
        px = jnp.pad(px, (0, pad))
        py = jnp.pad(py, (0, pad))
    kd = jax.random.key_data(key).astype(jnp.uint32)
    seed = (kd[0] ^ (kd[1] * jnp.uint32(40503))).astype(jnp.int32)[None]
    if geo is None:
        geo = build_geo_rows(scn, statics)
    cam_row = pack_camera_row(cam)
    interpret = jax.default_backend() != "tpu"
    out = _run_primary(
        seed, cam_row, px, py, geo, scn.light_packed, statics, max_tries,
        tuple(float(c) for c in bg), width, height, interpret,
    )
    out = [c[:b] for c in out]
    return (
        Vec3(out[0], out[1], out[2]),
        Vec3(out[3], out[4], out[5]),
        Vec3(out[6], out[7], out[8]),
        Vec3(out[9], out[10], out[11]),
        out[12] > 0.5,
    )


def _persistent_kernel(statics: SceneStatics, spec: tuple, k_tries: int,
                       bg: tuple, ray_depth: int, width: int, height: int,
                       seed_ref, cam_ref,
                       px_ref, py_ref, kmax_ref,
                       rox, roy, roz, rdx, rdy, rdz,
                       tx, ty, tz, radx, rady, radz, aliv,
                       k_ref, dep_ref, accx, accy, accz,
                       geo, lp_ref,
                       o_rox, o_roy, o_roz, o_rdx, o_rdy, o_rdz,
                       o_tx, o_ty, o_tz, o_radx, o_rady, o_radz, o_aliv,
                       o_k, o_dep, o_accx, o_accy, o_accz,
                       o_nv, o_more):
    """One persistent-wavefront round: flush + restart + camera jitter +
    the full fused bounce, entirely in VMEM (integrator/wavefront.py
    render_wavefront_sticky's fused path). The XLA glue per round reduces
    to two scalar reductions (path-vertex count, any-work-left flag).

    Restart rule (pixel-sticky, jmax == 1): lane ``l`` owns pixel ``l`` of
    the tile and walks its ``samples`` paths sequentially; ``k``/``kmax``
    are paths started / sample budget per lane, and the per-pixel radiance
    accumulator ``acc`` lives at the lane's own slot -- no scatter, no
    cross-lane coordination (counters in f32: budgets are << 2^24)."""
    pltpu.prng_seed(seed_ref[0] + pl.program_id(0) * jnp.int32(-1640531527))
    unif = make_unif(BLK)

    ro = Vec3(rox[:], roy[:], roz[:])
    rd = Vec3(rdx[:], rdy[:], rdz[:])
    thr = Vec3(tx[:], ty[:], tz[:])
    rad = Vec3(radx[:], rady[:], radz[:])
    alive = aliv[:] > 0.5
    k = k_ref[:]
    kmax = kmax_ref[:]
    depth = dep_ref[:]

    # --- flush finished paths into the per-lane pixel accumulator ----------
    dead = ~alive
    flush = dead & (k > 0.5)
    ax = jnp.where(flush, accx[:] + rad.x, accx[:])
    ay = jnp.where(flush, accy[:] + rad.y, accy[:])
    az = jnp.where(flush, accz[:] + rad.z, accz[:])
    zero = ro.x * 0.0
    rad = where3(dead, Vec3(zero, zero, zero), rad)

    # --- restart: next sample of the lane's pixel --------------------------
    take = dead & (k < kmax)
    k = jnp.where(take, k + 1.0, k)
    depth = jnp.where(take, zero, depth)
    one = zero + 1.0
    thr = where3(take, Vec3(one, one, one), thr)
    u0, u1 = unif(), unif()
    sx = (2.0 * (px_ref[:] + u0) / width - 1.0) * cam_ref[0, _CAM_TANX]
    sy = -(2.0 * (py_ref[:] + u1) / height - 1.0) * cam_ref[0, _CAM_TANY]

    def axis(i):
        return (
            sx * cam_ref[0, _CAM_RIGHT + i]
            + sy * cam_ref[0, _CAM_UP + i]
            + cam_ref[0, _CAM_FWD + i]
        )

    d = Vec3(axis(0), axis(1), axis(2)).normalize()
    o = Vec3(zero + cam_ref[0, _CAM_POS], zero + cam_ref[0, _CAM_POS + 1],
             zero + cam_ref[0, _CAM_POS + 2])
    ro = where3(take, o, ro)
    rd = where3(take, d, rd)
    alive = alive | take

    # --- the fused bounce --------------------------------------------------
    point, l, thr, rad, new_alive = _bounce_math(
        statics, spec, k_tries, bg, unif, geo, lp_ref,
        ro, rd, thr, rad, alive,
    )
    # per-lane final depth: emission was collected above; the lane dies (the
    # reference's depth-0 black return, src/rendering.rs:93-95)
    cont = new_alive & (depth < float(ray_depth - 1))

    o_rox[:] = point.x
    o_roy[:] = point.y
    o_roz[:] = point.z
    o_rdx[:] = l.x
    o_rdy[:] = l.y
    o_rdz[:] = l.z
    o_tx[:] = thr.x
    o_ty[:] = thr.y
    o_tz[:] = thr.z
    o_radx[:] = rad.x
    o_rady[:] = rad.y
    o_radz[:] = rad.z
    o_aliv[:] = cont.astype(jnp.float32)
    o_k[:] = k
    o_dep[:] = depth + 1.0
    o_accx[:] = ax
    o_accy[:] = ay
    o_accz[:] = az
    blk = pl.program_id(0)
    o_nv[blk, 0] = jnp.sum(alive.astype(jnp.float32))
    o_more[blk, 0] = jnp.sum((cont | (k < kmax)).astype(jnp.float32))


@functools.partial(
    jax.jit,
    static_argnames=("statics", "k_tries", "bg", "ray_depth", "width",
                     "height"),
)
def _run_persistent(seed, cam_row, px, py, kmax, state18, geo, lp,
                    statics, k_tries, bg, ray_depth, width, height):
    b = state18[0].shape[0]
    vma = vma_union(seed, cam_row, px, py, kmax, *state18, geo, lp)
    seed = cast_to_vma(seed, vma)
    cam_row = cast_to_vma(cam_row, vma)
    px = cast_to_vma(px, vma)
    py = cast_to_vma(py, vma)
    kmax = cast_to_vma(kmax, vma)
    geo = cast_to_vma(geo, vma)
    lp = cast_to_vma(lp, vma)
    state18 = tuple(cast_to_vma(c, vma) for c in state18)
    nb = b // BLK
    grid = (nb,)
    ray_spec = pl.BlockSpec((BLK,), lambda i: (i,), memory_space=pltpu.VMEM)
    blk_scalar = pl.BlockSpec((nb, 1), lambda i: (0, 0),
                              memory_space=pltpu.SMEM)
    in_specs = (
        [
            pl.BlockSpec((1,), lambda i: (0,), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 128), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ]
        + [ray_spec] * 3  # px, py, kmax
        + [ray_spec] * 18  # carried state
        + [
            pl.BlockSpec(geo.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(lp.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ]
    )
    out = pl.pallas_call(
        functools.partial(_persistent_kernel, statics, statics.mega_spec,
                          k_tries, bg, ray_depth, width, height),
        grid=grid,
        in_specs=in_specs,
        out_specs=[ray_spec] * 18 + [blk_scalar] * 2,
        out_shape=[
            jax.ShapeDtypeStruct((b,), jnp.float32, vma=vma)
            for _ in range(18)
        ]
        + [jax.ShapeDtypeStruct((nb, 1), jnp.float32, vma=vma)] * 2,
        # donate the 18 carried state buffers to their outputs
        input_output_aliases={5 + i: i for i in range(18)},
    )(seed, cam_row, px, py, kmax, *state18, geo, lp)
    return out


def persistent_round(
    key: jax.Array,
    cam_row: jnp.ndarray,
    px: jnp.ndarray,
    py: jnp.ndarray,
    kmax: jnp.ndarray,
    state18: tuple,
    scn: SceneArrays,
    statics: SceneStatics,
    bg: tuple,
    max_tries: int,
    ray_depth: int,
    width: int,
    height: int,
    geo: jnp.ndarray | None = None,
):
    """One fused restart+bounce round over (B,) lanes (B % BLK == 0).

    ``state18`` = (ro3, rd3, thr3, rad3, alive, k, depth, acc3) as flat f32
    arrays. Returns (state18', nverts_this_round, work_left_count). Callers
    looping over rounds should prebuild ``geo`` (build_geo_rows)."""
    kd = jax.random.key_data(key).astype(jnp.uint32)
    seed = (kd[0] ^ (kd[1] * jnp.uint32(40503))).astype(jnp.int32)[None]
    if geo is None:
        geo = build_geo_rows(scn, statics)
    out = _run_persistent(
        seed, cam_row, px, py, kmax, tuple(state18), geo,
        scn.light_packed, statics, max_tries,
        tuple(float(c) for c in bg), ray_depth, width, height,
    )
    return tuple(out[:18]), jnp.sum(out[18]), jnp.sum(out[19])


def megakernel_eligible(statics: SceneStatics, scn: SceneArrays) -> bool:
    """Any small scene (finite prims + planes <= MAX_PRIMS) whose light
    count fits the in-kernel unrolled light pdf -- the whole dense family,
    including analytic primitives and delta materials since round 4."""
    return (
        bool(statics.mega_spec)
        and len(statics.mega_spec) <= MAX_PRIMS
        and statics.num_lights <= UNROLL_MAX_LIGHTS
    )


def bounce_pallas(
    key: jax.Array,
    ro: Vec3,
    rd: Vec3,
    throughput: Vec3,
    radiance: Vec3,
    alive: jnp.ndarray,
    scn: SceneArrays,
    statics: SceneStatics,
    bg: tuple,
    max_tries: int = 4,
    final_only: bool = False,
    geo: jnp.ndarray | None = None,
):
    """One full bounce; returns (ro', rd', throughput', radiance', alive').

    ``final_only`` runs intersect + emission only (the integrator's
    epilogue depth level, src/rendering.rs:93-95): radiance' and alive' are
    meaningful, ray/throughput outputs are passthrough. Callers looping
    over bounces should prebuild ``geo`` once (build_geo_rows) so the
    table stack isn't re-emitted per iteration."""
    b = ro.x.shape[0]
    pad = (-b) % BLK
    state = [
        ro.x, ro.y, ro.z, rd.x, rd.y, rd.z,
        throughput.x, throughput.y, throughput.z,
        radiance.x, radiance.y, radiance.z,
        alive.astype(jnp.float32),
    ]
    if pad:
        state = [jnp.pad(c, (0, pad)) for c in state]
    kd = jax.random.key_data(key).astype(jnp.uint32)
    seed = (kd[0] ^ (kd[1] * jnp.uint32(40503))).astype(jnp.int32)[None]
    if geo is None:
        geo = build_geo_rows(scn, statics)
    interpret = jax.default_backend() != "tpu"
    out = _run(
        seed, tuple(state), geo, scn.light_packed,
        statics, max_tries, tuple(float(c) for c in bg), final_only,
        interpret,
    )
    out = [c[:b] for c in out]
    return (
        Vec3(out[0], out[1], out[2]),
        Vec3(out[3], out[4], out[5]),
        Vec3(out[6], out[7], out[8]),
        Vec3(out[9], out[10], out[11]),
        out[12] > 0.5,
    )
