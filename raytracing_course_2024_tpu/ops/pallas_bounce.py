"""Pallas TPU megakernel: one FULL path-tracing bounce in a single kernel.

The headline scene (practice7_1: 36 triangles) spends its bounce across
~40 XLA fusions (intersect kernel, detail gathers, sampling kernel, pdf,
brdf, state updates), each one an HBM round-trip of (B,) intermediates.
This kernel runs the ENTIRE bounce body of the integrator
(integrator/path.py:_bounce) per 8192-ray block inside VMEM:

1. dense Moller-Trumbore over the whole (small) triangle table, tracking
   the winner's (t, index, u, v) in registers;
2. surface detail: the winner's shading normals + material come from
   statically-unrolled compare-select chains over the (C, N) attribute
   table (a one-hot MXU dot_general was tried first and made the Mosaic
   compile explode; N <= 128 keeps the chains cheap VPU work);
3. emission / background accumulation into the radiance carry;
4. the full MIS mixture sampling stage (shared body with
   ops/pallas_sampling; TPU hardware PRNG);
5. glTF metallic-roughness BRDF + cos/pdf weight -> throughput update.

Scope: small all-triangle scenes without delta materials (MIRROR /
DIELECTRIC take integrator branches with different ray-continuation rules)
-- exactly the headline benchmark family. Everything else keeps the
modular kernels. The reference evaluates the same bounce as one inlined
call tree (src/rendering.rs:86-127); this is its TPU equivalent.

RNG: per (bounce, block) hardware-PRNG streams; statistically equivalent
to the XLA threefry path but a different stream, like the sampler kernel.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..scene.types import SceneArrays, SceneStatics
from .brdf import eval_brdf
from .pallas_intersect import MAX_PRIMS, cast_to_vma, vma_union
from .pallas_sampling import make_unif, mixture_body
from .vec import Vec3, where3

BLK = 8192  # the hardware-PRNG reshape only lowers at this block shape
EPS_BACKOFF = 1e-4  # src/rendering.rs:98 via ops/scene_intersect.py

# attrs table rows (C_ATTR, N): one one-hot matmul fetches them all
_SN0 = 0  # 0-2 shading normals
_SN1 = 3
_SN2 = 6
_COLOR = 9
_METAL = 12
_ROUGH = 13
_EMIT = 14  # 14-16
_MKIND = 17
C_ATTR = 18


def build_attr_rows(scn: SceneArrays) -> jnp.ndarray:
    """(C_ATTR, N) f32 per-triangle shading/material attribute rows."""
    cols = [
        scn.sn0[:, 0], scn.sn0[:, 1], scn.sn0[:, 2],
        scn.sn1[:, 0], scn.sn1[:, 1], scn.sn1[:, 2],
        scn.sn2[:, 0], scn.sn2[:, 1], scn.sn2[:, 2],
        scn.color[:, 0], scn.color[:, 1], scn.color[:, 2],
        scn.metallic, scn.roughness,
        scn.emission[:, 0], scn.emission[:, 1], scn.emission[:, 2],
        scn.mkind.astype(jnp.float32),
    ]
    return jnp.stack(cols)


def _bounce_math(statics, n_prims, k_tries, bg, unif, tri, attr, lp_ref,
                 ro, rd, thr, rad, alive):
    """Sections 1-5 of the fused bounce (intersect -> detail -> emission ->
    sampling -> BRDF weight), shared by the per-bounce megakernel and the
    persistent sticky kernel. Returns (point, l, thr', rad', alive') with
    ``alive'`` = survived-this-bounce (no depth rule applied)."""
    # --- 1. dense MT intersect, tracking (t, i, u, v) ----------------------
    best_t = jnp.full((BLK,), jnp.inf, jnp.float32)
    best_i = jnp.zeros((BLK,), jnp.int32)
    best_u = jnp.zeros((BLK,), jnp.float32)
    best_v = jnp.zeros((BLK,), jnp.float32)
    ox, oy, oz = ro.x, ro.y, ro.z
    dx, dy, dz = rd.x, rd.y, rd.z
    for i in range(n_prims):  # static unroll; tri reads fold to immediates
        e1x, e1y, e1z = tri[3, i], tri[4, i], tri[5, i]
        e2x, e2y, e2z = tri[6, i], tri[7, i], tri[8, i]
        pvx = dy * e2z - dz * e2y
        pvy = dz * e2x - dx * e2z
        pvz = dx * e2y - dy * e2x
        det = e1x * pvx + e1y * pvy + e1z * pvz
        inv_det = 1.0 / jnp.where(jnp.abs(det) > 1e-30, det, 1e-30)
        tvx, tvy, tvz = ox - tri[0, i], oy - tri[1, i], oz - tri[2, i]
        u = (tvx * pvx + tvy * pvy + tvz * pvz) * inv_det
        qvx = tvy * e1z - tvz * e1y
        qvy = tvz * e1x - tvx * e1z
        qvz = tvx * e1y - tvy * e1x
        v = (dx * qvx + dy * qvy + dz * qvz) * inv_det
        t = (e2x * qvx + e2y * qvy + e2z * qvz) * inv_det
        ok = (
            (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
            & (jnp.abs(det) > 1e-30) & (t > 0.0) & (t < best_t)
        )
        best_t = jnp.where(ok, t, best_t)
        best_i = jnp.where(ok, i, best_i)
        best_u = jnp.where(ok, u, best_u)
        best_v = jnp.where(ok, v, best_v)

    hit = jnp.isfinite(best_t)

    # --- 2. surface detail: winner attributes via unrolled select chains ---
    # (a one-hot (BLK, N) @ (N, C) dot_general was tried first; its tiny
    # non-128-aligned contraction made the Mosaic compile explode. N is
    # <= MAX_PRIMS=128 here, so per-attribute compare-select chains are
    # cheap VPU work and the scalar table reads fold to immediates.)
    def gather_row(row_ref, row):
        out = row_ref[row, 0] + ox * 0.0
        for i in range(1, n_prims):
            out = jnp.where(best_i == i, row_ref[row, i], out)
        return out

    def a3(base):
        return Vec3(
            gather_row(attr, base),
            gather_row(attr, base + 1),
            gather_row(attr, base + 2),
        )

    # flat normal from the winner's edges (same select-chain ride on tri)
    e1 = Vec3(gather_row(tri, 3), gather_row(tri, 4), gather_row(tri, 5))
    e2 = Vec3(gather_row(tri, 6), gather_row(tri, 7), gather_row(tri, 8))
    flat_n = e1.cross(e2).normalize()
    front = flat_n.dot(rd) < 0.0
    sign = jnp.where(front, 1.0, -1.0)
    n_geom = flat_n * sign
    sn0, sn1, sn2 = a3(_SN0), a3(_SN1), a3(_SN2)
    n_shade = (
        sn0 + (sn1 - sn0) * best_u + (sn2 - sn0) * best_v
    ).normalize() * sign
    t_safe = jnp.where(hit, best_t, 1.0)
    point = ro + rd * (t_safe - EPS_BACKOFF)
    color = a3(_COLOR)
    metallic = gather_row(attr, _METAL)
    roughness = gather_row(attr, _ROUGH)
    emission = a3(_EMIT)
    mkind = gather_row(attr, _MKIND).astype(jnp.int32)

    # --- 3. emission / background ------------------------------------------
    bgv = Vec3(
        jnp.full((BLK,), bg[0], jnp.float32),
        jnp.full((BLK,), bg[1], jnp.float32),
        jnp.full((BLK,), bg[2], jnp.float32),
    )
    miss = alive & ~hit
    on_hit = alive & hit
    zero3 = Vec3(ox * 0.0, ox * 0.0, ox * 0.0)
    rad = rad + where3(miss, thr.mul(bgv), where3(on_hit, thr.mul(emission), zero3))
    alive = on_hit

    # --- 4. mixture sampling -----------------------------------------------
    v_dir = rd * -1.0
    lp = lp_ref[:, :] if statics.num_lights > 0 else None
    l, pdf, ok = mixture_body(
        unif, point, n_geom, n_shade, v_dir, roughness, lp, statics, k_tries
    )

    # --- 5. BRDF weight + state update -------------------------------------
    f = eval_brdf(l, n_geom, v_dir, color, metallic, roughness, mkind)
    cos_l = jnp.maximum(l.dot(n_geom), 0.0)
    w = f * (cos_l / pdf)
    new_alive = alive & ok
    thr = thr.mul(where3(new_alive, w, zero3))
    return point, l, thr, rad, new_alive


def _kernel(statics: SceneStatics, n_prims: int, k_tries: int, bg: tuple,
            seed_ref,
            rox, roy, roz, rdx, rdy, rdz,
            tx, ty, tz, radx, rady, radz, aliv,
            tri, attr, lp_ref,
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
        statics, n_prims, k_tries, bg, unif, tri, attr, lp_ref,
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
    jax.jit, static_argnames=("statics", "k_tries", "bg", "interpret")
)
def _run(seed, state13, tri, attr, lp, statics, k_tries, bg, interpret):
    b = state13[0].shape[0]
    vma = vma_union(seed, *state13, tri, attr, lp)
    seed = cast_to_vma(seed, vma)
    tri = cast_to_vma(tri, vma)
    attr = cast_to_vma(attr, vma)
    lp = cast_to_vma(lp, vma)
    state13 = tuple(cast_to_vma(c, vma) for c in state13)
    n = tri.shape[1]
    grid = (b // BLK,)
    ray_spec = pl.BlockSpec((BLK,), lambda i: (i,), memory_space=pltpu.VMEM)
    in_specs = (
        [pl.BlockSpec((1,), lambda i: (0,), memory_space=pltpu.SMEM)]
        + [ray_spec] * 13
        + [
            pl.BlockSpec((9, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(attr.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(lp.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
        ]
    )
    out = pl.pallas_call(
        functools.partial(_kernel, statics, n, k_tries, bg),
        grid=grid,
        in_specs=in_specs,
        out_specs=[ray_spec] * 13,
        out_shape=[
            jax.ShapeDtypeStruct((b,), jnp.float32, vma=vma) for _ in range(13)
        ],
        interpret=pltpu.InterpretParams() if interpret else False,
    )(seed, *state13, tri, attr, lp)
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


def _persistent_kernel(statics: SceneStatics, n_prims: int, k_tries: int,
                       bg: tuple, ray_depth: int, width: int, height: int,
                       seed_ref, cam_ref,
                       px_ref, py_ref, kmax_ref,
                       rox, roy, roz, rdx, rdy, rdz,
                       tx, ty, tz, radx, rady, radz, aliv,
                       k_ref, dep_ref, accx, accy, accz,
                       tri, attr, lp_ref,
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
        statics, n_prims, k_tries, bg, unif, tri, attr, lp_ref,
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
def _run_persistent(seed, cam_row, px, py, kmax, state18, tri, attr, lp,
                    statics, k_tries, bg, ray_depth, width, height):
    b = state18[0].shape[0]
    vma = vma_union(seed, cam_row, px, py, kmax, *state18, tri, attr, lp)
    seed = cast_to_vma(seed, vma)
    cam_row = cast_to_vma(cam_row, vma)
    px = cast_to_vma(px, vma)
    py = cast_to_vma(py, vma)
    kmax = cast_to_vma(kmax, vma)
    tri = cast_to_vma(tri, vma)
    attr = cast_to_vma(attr, vma)
    lp = cast_to_vma(lp, vma)
    state18 = tuple(cast_to_vma(c, vma) for c in state18)
    n = tri.shape[1]
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
            pl.BlockSpec((9, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(attr.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(lp.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ]
    )
    out = pl.pallas_call(
        functools.partial(_persistent_kernel, statics, n, k_tries, bg,
                          ray_depth, width, height),
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
    )(seed, cam_row, px, py, kmax, *state18, tri, attr, lp)
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
):
    """One fused restart+bounce round over (B,) lanes (B % BLK == 0).

    ``state18`` = (ro3, rd3, thr3, rad3, alive, k, depth, acc3) as flat f32
    arrays. Returns (state18', nverts_this_round, work_left_count)."""
    kd = jax.random.key_data(key).astype(jnp.uint32)
    seed = (kd[0] ^ (kd[1] * jnp.uint32(40503))).astype(jnp.int32)[None]
    attr = build_attr_rows(scn)
    out = _run_persistent(
        seed, cam_row, px, py, kmax, tuple(state18), scn.tri_pack, attr,
        scn.light_packed, statics, max_tries,
        tuple(float(c) for c in bg), ray_depth, width, height,
    )
    return tuple(out[:18]), jnp.sum(out[18]), jnp.sum(out[19])


def megakernel_eligible(statics: SceneStatics, scn: SceneArrays) -> bool:
    return (
        not statics.any_nontri
        and not statics.any_delta
        and statics.num_planes == 0
        and scn.tri_pack is not None
        and scn.tri_pack.shape[1] <= MAX_PRIMS
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
):
    """One full bounce; returns (ro', rd', throughput', radiance', alive')."""
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
    attr = build_attr_rows(scn)
    interpret = jax.default_backend() != "tpu"
    out = _run(
        seed, tuple(state), scn.tri_pack, attr, scn.light_packed,
        statics, max_tries, tuple(float(c) for c in bg), interpret,
    )
    out = [c[:b] for c in out]
    return (
        Vec3(out[0], out[1], out[2]),
        Vec3(out[3], out[4], out[5]),
        Vec3(out[6], out[7], out[8]),
        Vec3(out[9], out[10], out[11]),
        out[12] > 0.5,
    )
