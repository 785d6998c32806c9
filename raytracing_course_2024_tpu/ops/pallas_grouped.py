"""Pallas TPU kernel: MXU block test for the sorted-pair grouped traversal.

Stage 6 of ops/grouped.py tests every 128-pair block against its treelet's
SLOTS triangle slots. The XLA fallback (`ops.grouped._block_mt`) gathers
the treelet's 9 geometry planes per block through XLA's ~88 GB/s gather
path and runs ~60 VPU flops per (pair, slot). This kernel instead:

* processes 8 pair-blocks per grid step (rays live in (1, 8, 128) VMEM
  blocks -- the (8, 128) tile Mosaic requires; a flat (128,) block loses
  to XLA's T(1024) 1-D layout choice);
* keeps ONE cached MT coefficient tile (ops/mt_pack.py; (24, 4*SLOTS):
  16 coefficient rows + the treelet centroid in row 16) in VMEM scratch
  that persists across grid steps, re-DMAing only when a block's treelet
  id differs from the cached one -- sort #1 makes treelet segments span
  many consecutive blocks, so DMA count ~ segments, not blocks (the
  naive per-block-DMA variant measured latency-bound at ~1.6 us/block);
* evaluates all SLOTS triangles with ONE dot_general on the MXU
  (contraction over the 16 bilinear ray features, HIGHEST precision so
  full f32 survives the systolic array);
* folds the MT predicate and the per-pair min/argmin in VMEM (manual
  iota-min argmin -- Mosaic cannot lower jnp.argmin), writing only
  (t, slot) per pair back to HBM;
* skips sentinel sub-blocks (beyond the real pair population): no DMA,
  no compute.

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
SUB = 16  # pair-blocks per grid step (a (16, 128) ray tile; bigger SUB
# amortizes the ~0.5 us/grid-step overhead over more blocks)
W_ROWS = 24  # 16 coefficient rows + centroid row (16) + pad to 8-multiple
CEN_ROW = 16


def _kernel(slots: int, sentinel: int, tmin: float, mode: str,
            tids_ref,
            rox, roy, roz, rdx, rdy, rdz,
            w_hbm,
            o_t, o_slot,
            w_scr, w_hi, w_lo, cur_tid, sem):
    g = pl.program_id(0)
    split = mode in ("split3", "split4")

    @pl.when(g == 0)
    def _():
        cur_tid[0] = -1  # no tile cached yet (scratch persists across grid)

    for j in range(SUB):
        tid = tids_ref[g * SUB + j]

        # sort #1 groups pairs by treelet, so a treelet's segment spans many
        # consecutive blocks (mean pairs/treelet >> BLOCK): only fetch the
        # coefficient tile when the id CHANGES -- total DMA count ~ number
        # of treelet segments, not number of blocks (measured 25x win: the
        # per-block-DMA variant was latency-bound at ~1.6 us/block)
        @pl.when((tid < sentinel) & (tid != cur_tid[0]))
        def _():
            dma = pltpu.make_async_copy(w_hbm.at[tid], w_scr, sem)
            dma.start()
            dma.wait()
            cur_tid[0] = tid
            if split:  # hi/lo bf16 split, once per tile fetch
                w32 = w_scr[0:16, :]
                hi = w32.astype(jnp.bfloat16)
                w_hi[:, :] = hi
                w_lo[:, :] = (w32 - hi.astype(jnp.float32)).astype(
                    jnp.bfloat16
                )

        @pl.when(tid < sentinel)
        def _(j=j):
            cx = w_scr[CEN_ROW, 0]
            cy = w_scr[CEN_ROW, 1]
            cz = w_scr[CEN_ROW, 2]
            ox = rox[0, j, :] - cx
            oy = roy[0, j, :] - cy
            oz = roz[0, j, :] - cz
            dx = rdx[0, j, :]
            dy = rdy[0, j, :]
            dz = rdz[0, j, :]
            one = jnp.ones_like(ox)
            # phi rows: [o (x) d row-major | o | d | 1] (ops/mt_pack.py),
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
            dims = (((0,), (0,)), ((), ()))
            if split:
                # manual bf16 hi/lo split: 3-4 DEFAULT-precision passes vs
                # HIGHEST's 6. bf16 x bf16 products are EXACT in f32 (8-bit
                # mantissas), so the only error is the split residual
                # (~2^-17 relative) plus, for split3, the dropped lo x lo
                # terms (~2^-16 relative).
                ph = phi.astype(jnp.bfloat16)
                pl_ = (phi - ph.astype(jnp.float32)).astype(jnp.bfloat16)

                def dd(a, b):
                    return jax.lax.dot_general(
                        a, b, dims,
                        preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.DEFAULT,
                    )

                out = dd(ph, w_hi[:, :]) + dd(ph, w_lo[:, :]) + dd(
                    pl_, w_hi[:, :]
                )
                if mode == "split4":
                    out = out + dd(pl_, w_lo[:, :])
            else:
                out = jax.lax.dot_general(
                    phi,
                    w_scr[0:16, :],
                    dims,
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST,
                )  # (BLOCK, 4*SLOTS), cols [det|udet|vdet|tdet]
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
            # manual argmin: first slot achieving the row min
            lane = jax.lax.broadcasted_iota(jnp.int32, t.shape, 1)
            t_min = jnp.min(t, axis=1, keepdims=True)
            o_slot[0, j, :] = jnp.min(
                jnp.where(t <= t_min, lane, jnp.int32(slots)), axis=1
            ).astype(jnp.int32)
            o_t[0, j, :] = t_min[:, 0]

        @pl.when(tid >= sentinel)
        def _(j=j):
            o_t[0, j, :] = jnp.full((BLOCK,), jnp.inf, jnp.float32)
            o_slot[0, j, :] = jnp.zeros((BLOCK,), jnp.int32)


@functools.partial(
    jax.jit, static_argnames=("slots", "tp", "tmin", "interpret", "precision")
)
def block_mt_pallas(
    block_tid: jnp.ndarray,  # (NB,) i32: each block's treelet id
    prx: tuple,  # 6 ray component arrays (NB, BLOCK) f32
    geom_w: jnp.ndarray,  # (Tp, 24, 4*SLOTS) f32 MT tiles + centroid row
    slots: int,
    tp: int,
    tmin: float = 0.0,
    interpret: bool = False,
    precision: str = "highest",
):
    """Returns (t (NB, BLOCK) f32 with INF misses, slot (NB, BLOCK) i32).

    ``precision``: "highest" (default) = full f32 through the MXU
    (6 bf16 passes). "split3"/"split4" = manual hi/lo bf16 split at
    DEFAULT precision (3/4 passes): Mosaic's dot lowering has no HIGH
    (bf16x3) mode, so the split is done by hand -- W tiles split once per
    cache fetch, phi per block. split4 keeps the lo x lo terms (error ~
    the 2^-17 split residual); split3 drops them (~2^-16 relative)."""
    nb = block_tid.shape[0]
    pad = (-nb) % SUB
    if pad:
        block_tid = jnp.concatenate(
            [block_tid, jnp.full((pad,), tp + 1, block_tid.dtype)]
        )
        prx = tuple(
            jnp.concatenate([c, jnp.zeros((pad, BLOCK), c.dtype)]) for c in prx
        )
    nbp = nb + pad
    vma = vma_union(block_tid, *prx, geom_w)
    block_tid = cast_to_vma(block_tid, vma)
    geom_w = cast_to_vma(geom_w, vma)
    prx = tuple(cast_to_vma(c.reshape(nbp // SUB, SUB, BLOCK), vma) for c in prx)
    sentinel = tp  # any tid >= Tp is a sentinel/filler-overflow block
    mode = precision if precision in ("split3", "split4") else "highest"

    ray_spec = pl.BlockSpec(
        (1, SUB, BLOCK), lambda i, tids: (i, 0, 0), memory_space=pltpu.VMEM
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nbp // SUB,),
        in_specs=[ray_spec] * 6
        + [pl.BlockSpec(memory_space=pl.ANY)],  # geometry stays in HBM
        out_specs=[ray_spec, ray_spec],
        scratch_shapes=[
            pltpu.VMEM((W_ROWS, 4 * slots), jnp.float32),
            pltpu.VMEM((16, 4 * slots), jnp.bfloat16),
            pltpu.VMEM((16, 4 * slots), jnp.bfloat16),
            pltpu.SMEM((1,), jnp.int32),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    t, slot = pl.pallas_call(
        functools.partial(_kernel, slots, sentinel, tmin, mode),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((nbp // SUB, SUB, BLOCK), jnp.float32, vma=vma),
            jax.ShapeDtypeStruct((nbp // SUB, SUB, BLOCK), jnp.int32, vma=vma),
        ],
        interpret=pltpu.InterpretParams() if interpret else False,
    )(block_tid, *prx, geom_w)
    return t.reshape(nbp, BLOCK)[:nb], slot.reshape(nbp, BLOCK)[:nb]
