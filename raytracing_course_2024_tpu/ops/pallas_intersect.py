"""Pallas TPU kernel: fused dense nearest-hit for small all-triangle scenes.

The XLA dense sweep materializes the (B, N) t-matrix in HBM and reduces it
with a separate argmin pass. This kernel keeps everything in VMEM/registers:
each grid step processes a BLK-ray block against the whole (small) triangle
table -- statically unrolled Moller-Trumbore per triangle, running min +
argmin in vector registers, one HBM write of (t, idx) per block.

Used for the headline benchmark scene (practice7_1: 36 triangles) and any
all-triangle scene with N <= MAX_PRIMS; larger or mixed-shape scenes take
the XLA dense sweep or the treelet path. Triangles are pre-processed to
(a, e1, e2) on the host so the kernel skips two vertex subtractions.

Falls back to interpret mode off-TPU (tests run it on CPU bit-for-bit).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .vec import Vec3

BLK = 8192
MAX_PRIMS = 128


def _kernel(n_prims: int, tmin: float, rox, roy, roz, rdx, rdy, rdz, tri,
            t_ref, i_ref):
    ox, oy, oz = rox[:], roy[:], roz[:]
    dx, dy, dz = rdx[:], rdy[:], rdz[:]
    best_t = jnp.full((BLK,), jnp.inf, jnp.float32)
    best_i = jnp.zeros((BLK,), jnp.int32)

    for i in range(n_prims):  # static unroll; tri reads fold to immediates
        ax, ay, az = tri[0, i], tri[1, i], tri[2, i]
        e1x, e1y, e1z = tri[3, i], tri[4, i], tri[5, i]
        e2x, e2y, e2z = tri[6, i], tri[7, i], tri[8, i]
        # pv = rd x e2
        pvx = dy * e2z - dz * e2y
        pvy = dz * e2x - dx * e2z
        pvz = dx * e2y - dy * e2x
        det = e1x * pvx + e1y * pvy + e1z * pvz
        inv_det = 1.0 / jnp.where(jnp.abs(det) > 1e-30, det, 1e-30)
        # tv = ro - a
        tvx, tvy, tvz = ox - ax, oy - ay, oz - az
        u = (tvx * pvx + tvy * pvy + tvz * pvz) * inv_det
        # qv = tv x e1
        qvx = tvy * e1z - tvz * e1y
        qvy = tvz * e1x - tvx * e1z
        qvz = tvx * e1y - tvy * e1x
        v = (dx * qvx + dy * qvy + dz * qvz) * inv_det
        t = (e2x * qvx + e2y * qvy + e2z * qvz) * inv_det
        ok = (
            (u >= 0.0)
            & (v >= 0.0)
            & (u + v <= 1.0)
            & (jnp.abs(det) > 1e-30)
            & (t > tmin)
            & (t < best_t)
        )
        best_t = jnp.where(ok, t, best_t)
        best_i = jnp.where(ok, i, best_i)

    t_ref[:] = best_t
    i_ref[:] = best_i


def vma_union(*xs) -> frozenset:
    """Union of the inputs' varying-manual-axes: pallas_call outputs carry
    no vma inference, so under shard_map(check_vma=True) the out_shape must
    declare how results vary (they vary exactly as the inputs do)."""
    out = frozenset()
    for x in xs:
        out = out | jax.typeof(x).vma
    return out


def cast_to_vma(x, vma: frozenset):
    """Mark ``x`` varying over every axis in ``vma`` it isn't already.

    Replicated kernel operands (geometry/light tables, seeds) must carry
    the same vma as the per-ray operands, or interpret mode -- which
    evaluates the kernel body as ordinary jax ops under shard_map -- rejects
    the mixed-vma elementwise math."""
    missing = tuple(sorted(vma - jax.typeof(x).vma))
    return jax.lax.pcast(x, missing, to="varying") if missing else x


@functools.partial(jax.jit, static_argnames=("tmin", "interpret"))
def _run(ro_x, ro_y, ro_z, rd_x, rd_y, rd_z, tri, tmin: float, interpret: bool):
    b = ro_x.shape[0]
    n = tri.shape[1]
    grid = (b // BLK,)
    vma = vma_union(ro_x, ro_y, ro_z, rd_x, rd_y, rd_z, tri)
    tri = cast_to_vma(tri, vma)
    ray_spec = pl.BlockSpec((BLK,), lambda i: (i,), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_kernel, n, tmin),
        grid=grid,
        in_specs=[ray_spec] * 6
        + [pl.BlockSpec((9, n), lambda i: (0, 0), memory_space=pltpu.VMEM)],
        out_specs=[ray_spec, ray_spec],
        out_shape=[
            jax.ShapeDtypeStruct((b,), jnp.float32, vma=vma),
            jax.ShapeDtypeStruct((b,), jnp.int32, vma=vma),
        ],
        interpret=interpret,
    )(ro_x, ro_y, ro_z, rd_x, rd_y, rd_z, tri)
    return out


def prepare_tri_pack(p0: np.ndarray, p1: np.ndarray, p2: np.ndarray) -> np.ndarray:
    """(N,3) verts -> (9, N) [a, e1, e2] kernel pack (host side)."""
    a = np.asarray(p0, np.float32)
    e1 = np.asarray(p1, np.float32) - a
    e2 = np.asarray(p2, np.float32) - a
    return np.ascontiguousarray(
        np.stack([a[:, 0], a[:, 1], a[:, 2],
                  e1[:, 0], e1[:, 1], e1[:, 2],
                  e2[:, 0], e2[:, 1], e2[:, 2]])
    )


def pallas_eligible(statics, n_prims: int) -> bool:
    return (not statics.any_nontri) and n_prims <= MAX_PRIMS


def pallas_dense_nearest(ro: Vec3, rd: Vec3, tri_pack: jnp.ndarray, tmin=0.0):
    """(best_t (B,), best_idx (B,)); B is padded to a BLK multiple inside."""
    b = ro.x.shape[0]
    pad = (-b) % BLK
    comps = [ro.x, ro.y, ro.z, rd.x, rd.y, rd.z]
    if pad:
        comps = [jnp.pad(c, (0, pad)) for c in comps]
    interpret = jax.default_backend() != "tpu"
    t, idx = _run(*comps, tri_pack, float(tmin), interpret)
    return t[:b], idx[:b]
