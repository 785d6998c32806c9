"""Pallas TPU kernel: MXU block test for the sorted-pair grouped traversal.

Stage 6 of ops/grouped.py tests every 128-pair block against its treelet's
SLOTS triangle slots. The XLA fallback (`ops.grouped._block_mt`) gathers
the treelet's 9 geometry planes per block through XLA's ~88 GB/s gather
path and runs ~60 VPU flops per (pair, slot). This kernel instead:

* streams each block's precomputed MT coefficient tile (ops/mt_pack.py:
  a (16, 4*SLOTS) matrix per treelet) from HBM with the scalar-prefetch
  DMA pattern -- the block's treelet id indexes the BlockSpec, so the DMA
  engine fetches exactly one tile per grid step at full HBM bandwidth;
* evaluates all SLOTS triangles with ONE dot_general on the MXU
  ((16, BLOCK) phi against the tile; contraction over the 16 bilinear ray
  features), HIGHEST precision so full f32 survives the systolic array;
* folds the MT predicate and the per-pair min/argmin in VMEM, writing only
  (t, slot) per pair back to HBM;
* skips sentinel blocks (beyond the real pair population) entirely --
  their DMA is clamped to tile 0 and the compute is predicated off.

Geometry is centroid-local per treelet (the tile is built from vertices
minus the treelet's AABB center; the kernel subtracts the same center from
ray origins), which keeps the bilinear products small and the f32 matmul
within ~1e-6 of the VPU kernel (tests/test_mt_pack.py + the grouped
agreement tests).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_intersect import cast_to_vma, vma_union

BLOCK = 128  # pairs per block (ops/grouped.py BLOCK)


def _kernel(slots: int, sentinel: int, tmin: float, precision,
            tids_ref,
            rox, roy, roz, rdx, rdy, rdz,
            w_ref, cen_ref,
            o_t, o_slot):
    i = pl.program_id(0)
    tid = tids_ref[i]

    @pl.when(tid < sentinel)
    def _():
        cx = cen_ref[0, 0]
        cy = cen_ref[0, 1]
        cz = cen_ref[0, 2]
        ox = rox[0, :] - cx
        oy = roy[0, :] - cy
        oz = roz[0, :] - cz
        dx = rdx[0, :]
        dy = rdy[0, :]
        dz = rdz[0, :]
        one = jnp.ones_like(ox)
        # phi rows: [o (x) d row-major | o | d | 1] (ops/mt_pack.py layout),
        # stacked on the sublane axis so the lane dim stays BLOCK
        phi = jnp.stack(
            [
                ox * dx, ox * dy, ox * dz,
                oy * dx, oy * dy, oy * dz,
                oz * dx, oz * dy, oz * dz,
                ox, oy, oz, dx, dy, dz, one,
            ],
            axis=0,
        )  # (16, BLOCK)
        out = jax.lax.dot_general(
            phi,
            w_ref[:, :],
            (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=precision,
        )  # (BLOCK, 4*SLOTS), cols component-major [det|udet|vdet|tdet]
        det = out[:, 0 * slots : 1 * slots]
        ud = out[:, 1 * slots : 2 * slots]
        vd = out[:, 2 * slots : 3 * slots]
        td = out[:, 3 * slots : 4 * slots]
        nz = jnp.abs(det) > 1e-30
        inv = 1.0 / jnp.where(nz, det, 1e-30)
        u = ud * inv
        v = vd * inv
        t = td * inv
        ok = (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0) & nz & (t > tmin)
        t = jnp.where(ok, t, jnp.inf)
        o_slot[0, :] = jnp.argmin(t, axis=1).astype(jnp.int32)
        o_t[0, :] = jnp.min(t, axis=1)

    @pl.when(tid >= sentinel)
    def _():
        o_t[0, :] = jnp.full((BLOCK,), jnp.inf, jnp.float32)
        o_slot[0, :] = jnp.zeros((BLOCK,), jnp.int32)


@functools.partial(
    jax.jit, static_argnames=("slots", "tp", "tmin", "interpret", "precision")
)
def block_mt_pallas(
    block_tid: jnp.ndarray,  # (NB,) i32: each block's treelet id
    prx: tuple,  # 6 ray component arrays (NB, BLOCK) f32
    geom_w: jnp.ndarray,  # (Tp*16, 4*SLOTS) f32 MT coefficient tiles
    cen: jnp.ndarray,  # (Tp, 128) f32, treelet centroid in cols 0-2
    slots: int,
    tp: int,
    tmin: float = 0.0,
    interpret: bool = False,
    precision: str = "highest",
):
    """Returns (t (NB, BLOCK) f32 with INF misses, slot (NB, BLOCK) i32).

    ``precision``: "highest" = full f32 through the MXU (6-pass);
    "high" = bf16x3 (~2x faster, ~21-bit mantissa -- sub-MC-noise hit-t
    error on centroid-local coords; RT_MT_PRECISION selects it for A/B)."""
    nb = block_tid.shape[0]
    prec = (
        jax.lax.Precision.HIGHEST
        if precision == "highest"
        else jax.lax.Precision.HIGH
    )
    vma = vma_union(block_tid, *prx, geom_w, cen)
    block_tid = cast_to_vma(block_tid, vma)
    geom_w = cast_to_vma(geom_w, vma)
    cen = cast_to_vma(cen, vma)
    prx = tuple(cast_to_vma(c, vma) for c in prx)
    sentinel = tp  # any tid >= Tp is a sentinel/filler-overflow block

    ray_spec = pl.BlockSpec(
        (1, BLOCK), lambda i, tids: (i, 0), memory_space=pltpu.VMEM
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nb,),
        in_specs=[
            ray_spec, ray_spec, ray_spec, ray_spec, ray_spec, ray_spec,
            pl.BlockSpec(
                (16, 4 * slots),
                lambda i, tids: (jnp.minimum(tids[i], tp - 1), 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 128),
                lambda i, tids: (jnp.minimum(tids[i], tp - 1), 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=[ray_spec, ray_spec],
    )
    t, slot = pl.pallas_call(
        functools.partial(_kernel, slots, sentinel, tmin, prec),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((nb, BLOCK), jnp.float32, vma=vma),
            jax.ShapeDtypeStruct((nb, BLOCK), jnp.int32, vma=vma),
        ],
        interpret=pltpu.InterpretParams() if interpret else False,
    )(block_tid, *prx, geom_w, cen)
    return t, slot
