"""Pallas TPU kernel: fused treelet-AABB cull -> crossing bit-words.

Stage 1 of the grouped traversal (ops/grouped._cull_bits) slab-tests every
ray against every treelet AABB and packs the (B, Tp) crossing matrix into
word-major (W, B) u32 bit-words plus per-treelet ray counts. The XLA
version is HBM-bound, not flop-bound: the fused slab chain materializes
several (B, Tp) f32/bool intermediates (~600 MB of traffic per pass at
262k x 576), measured 5.9-8.4 ms/bounce on v5e where the VPU roofline is
~1 ms. This kernel keeps the whole (ray-tile, Tp) slab in VMEM:

* grid over L-ray tiles; rays arrive as one (8, B) row-major array
  (components on sublanes) and treelet boxes as a pre-transposed
  (Tpp, 128) tile (six used columns), so the (Tpp, L) slab is pure
  sublane x lane broadcasting -- no in-kernel relayouts;
* bit-packing IS a matmul: ``words16 = S @ hit`` where S is the constant
  (2*Wp, Tpp) selection matrix S[2w+h, 32w+16h+k] = 2^k. All entries are
  powers of two (exact in bf16) and hit is 0/1, so a DEFAULT-precision
  MXU pass is EXACT (half-word sums < 2^16 < f32's 2^24 integer range);
  the XLA wrapper fuses the u32 halves;
* per-treelet counts accumulate in a revisited output block
  (``jnp.sum(hit, axis=1)`` per tile), replacing a second (B, Tp) pass;
* treelet chunks of TC=512 bound VMEM at large Tp (word bit-spans never
  straddle a chunk: 512 is a multiple of 32, so the matmul accumulation
  stays exact).

Slab math (DIR_BIAS, comparison order) replicates ops.grouped._slab_lo_hi
op-for-op, so words and counts are bit-identical to the XLA path (pinned
by tests/test_pallas_grouped.py in interpret mode).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .intersect import DIR_BIAS
from .pallas_intersect import cast_to_vma, vma_union

L = 512  # rays per grid step
TC = 512  # treelet rows per in-kernel chunk (multiple of 32)


def _kernel(tpp: int, tmin: float, rays, aabb_t, s_ref, words_ref,
            counts_ref):
    g = pl.program_id(0)

    @pl.when(g == 0)
    def _():
        counts_ref[:, :] = jnp.zeros_like(counts_ref)

    o = [rays[c : c + 1, :] for c in range(3)]  # (1, L)
    d = [rays[3 + c : 4 + c, :] for c in range(3)]
    inv = [1.0 / (d[ax] + DIR_BIAS) for ax in range(3)]

    nchunks = tpp // TC if tpp >= TC else 1
    tc = tpp // nchunks
    for c in range(nchunks):
        lo = None
        hi = None
        for ax in range(3):
            mn = aabb_t[c * tc : (c + 1) * tc, ax : ax + 1]  # (tc, 1)
            mx = aabb_t[c * tc : (c + 1) * tc, 3 + ax : 4 + ax]
            a = (mn - o[ax]) * inv[ax]  # (tc, L)
            b = (mx - o[ax]) * inv[ax]
            l, h = jnp.minimum(a, b), jnp.maximum(a, b)
            lo = l if lo is None else jnp.maximum(lo, l)
            hi = h if hi is None else jnp.minimum(hi, h)
        hit = ((lo <= hi) & (hi > tmin)).astype(jnp.float32)  # (tc, L)
        srows = s_ref.shape[0] // nchunks  # per-chunk word rows (16 tris
        # per row-half, tc multiple of 32 -> chunk-local rows)
        s_chunk = s_ref[c * srows : (c + 1) * srows, c * tc : (c + 1) * tc]
        part = jax.lax.dot_general(
            s_chunk, hit, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT,
        )  # (srows, L) -- exact: power-of-two weights x 0/1 hits
        words_ref[0, c * srows : (c + 1) * srows, :] = part
        counts_ref[c * tc : (c + 1) * tc, 0:1] = (
            counts_ref[c * tc : (c + 1) * tc, 0:1]
            + jnp.sum(hit, axis=1, keepdims=True)
        )


@functools.partial(jax.jit, static_argnames=("tp", "tmin", "interpret"))
def _run(rays8, aabb_t, s, tp: int, tmin: float, interpret: bool):
    b = rays8.shape[1]
    tpp = aabb_t.shape[0]
    srows = s.shape[0]
    nsteps = b // L
    vma = vma_union(rays8, aabb_t, s)
    rays8 = cast_to_vma(rays8, vma)
    aabb_t = cast_to_vma(aabb_t, vma)
    s = cast_to_vma(s, vma)
    words16, counts = pl.pallas_call(
        functools.partial(_kernel, tpp, tmin),
        grid=(nsteps,),
        in_specs=[
            pl.BlockSpec((8, L), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((tpp, 128), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((srows, tpp), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, srows, L), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tpp, 128), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((nsteps, srows, L), jnp.float32, vma=vma),
            jax.ShapeDtypeStruct((tpp, 128), jnp.float32, vma=vma),
        ],
        interpret=pltpu.InterpretParams() if interpret else False,
    )(rays8, aabb_t, s)

    wp = srows // 2
    even = words16[:, 0 : 2 * wp : 2, :].astype(jnp.uint32)
    odd = words16[:, 1 : 2 * wp : 2, :].astype(jnp.uint32)
    words = even | (odd << jnp.uint32(16))  # (nsteps, Wp, L)
    words = words.transpose(1, 0, 2).reshape(wp, nsteps * L)
    w = tp // 32
    return words[:w, :], counts[:tp, 0].astype(jnp.int32)


# ---------------------------------------------------------------------------
# fused cull + main-tier pop: crossing words never round-trip HBM
# ---------------------------------------------------------------------------


def _kernel_pop(tpp: int, tmin: float, k1: int, rays, aabb_t, s_ref,
                tid_ref, res_ref, counts_ref):
    """Cull + pop the first ``k1`` set bits per ray inside the kernel.

    Same slab math as ``_kernel``; the packed u32 words stay in VMEM and
    the main-tier extraction (ops/grouped._pop_k's lowest-bit x & -x +
    f32-exponent trick, op-for-op) runs on them before anything is written
    back -- only the k1 popped treelet ids and the RESIDUAL words reach
    HBM. The selection matrix here is the half-grouped layout
    (``_pack_s_halves``): all low half-words first, then all high
    half-words, so the post-matmul u32 reassembly is two contiguous
    sublane slices instead of a strided relayout."""
    g = pl.program_id(0)

    @pl.when(g == 0)
    def _():
        counts_ref[:, :] = jnp.zeros_like(counts_ref)

    o = [rays[c : c + 1, :] for c in range(3)]  # (1, L)
    d = [rays[3 + c : 4 + c, :] for c in range(3)]
    inv = [1.0 / (d[ax] + DIR_BIAS) for ax in range(3)]

    wp = tpp // 32
    lows = []
    highs = []
    start = 0
    while start < tpp:  # chunk boundaries stay multiples of 128 (so of 32)
        tc = min(TC, tpp - start)
        lo = None
        hi = None
        for ax in range(3):
            mn = aabb_t[start : start + tc, ax : ax + 1]  # (tc, 1)
            mx = aabb_t[start : start + tc, 3 + ax : 4 + ax]
            a = (mn - o[ax]) * inv[ax]  # (tc, L)
            b = (mx - o[ax]) * inv[ax]
            l, h = jnp.minimum(a, b), jnp.maximum(a, b)
            lo = l if lo is None else jnp.maximum(lo, l)
            hi = h if hi is None else jnp.minimum(hi, h)
        hit = ((lo <= hi) & (hi > tmin)).astype(jnp.float32)  # (tc, L)
        wo, wc = start // 32, tc // 32
        for half, out in ((0, lows), (1, highs)):
            s_chunk = s_ref[half * wp + wo : half * wp + wo + wc,
                            start : start + tc]
            out.append(
                jax.lax.dot_general(
                    s_chunk, hit, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.DEFAULT,
                )
            )  # (wc, L) -- exact: power-of-two weights x 0/1 hits
        counts_ref[start : start + tc, 0:1] = (
            counts_ref[start : start + tc, 0:1]
            + jnp.sum(hit, axis=1, keepdims=True)
        )
        start += tc

    # Mosaic cannot convert f32 <-> u32 in-kernel (found on hardware,
    # round 5: "Unsupported cast: float32 -> uint32"; interpret accepts
    # it). The word halves are exact integers < 2^16, so hop through i32
    # (supported) and bitcast -- identical bits, lowers on device.
    w_lo = jax.lax.bitcast_convert_type(
        jnp.concatenate(lows, axis=0).astype(jnp.int32), jnp.uint32
    )  # (wp, L)
    w_hi = jax.lax.bitcast_convert_type(
        jnp.concatenate(highs, axis=0).astype(jnp.int32), jnp.uint32
    )
    m = w_lo | (w_hi << jnp.uint32(16))

    iw = jax.lax.broadcasted_iota(jnp.int32, m.shape, 0)
    for k in range(k1):
        low_w = m & (jnp.uint32(0) - m)  # isolate lowest set bit per word
        has_w = m != jnp.uint32(0)
        # all intermediates stay 2-D: (1, L) rows, no 1-D relayouts
        wsel = jnp.min(jnp.where(has_w, iw, wp), axis=0, keepdims=True)
        sel = iw == wsel  # (wp, L)
        # exactly one selected row per lane is nonzero and a power of two,
        # so an f32 sum is exact and its exponent is the bit index.
        # u32->f32 also fails to lower on Mosaic: bitcast to i32 first
        # (i32->f32 is supported; bit 31 becomes -2^31, still a power of
        # two, same exponent field) and mask the sign bit out of the
        # shifted exponent.
        low_i = jax.lax.bitcast_convert_type(low_w, jnp.int32)
        lowf = jnp.sum(
            jnp.where(sel, low_i.astype(jnp.float32), 0.0),
            axis=0, keepdims=True,
        )
        e = (
            (
                jax.lax.shift_right_logical(
                    jax.lax.bitcast_convert_type(lowf, jnp.int32), 23
                )
                & 0xFF
            )
            - 127
        )
        tid_ref[0, k : k + 1, :] = jnp.where(wsel < wp, wsel * 32 + e, -1)
        m = m ^ jnp.where(sel, low_w, jnp.uint32(0))
    res_ref[0, :wp, :] = m


@functools.partial(
    jax.jit, static_argnames=("tp", "tmin", "k1", "interpret")
)
def _run_pop(rays8, aabb_t, s, tp: int, tmin: float, k1: int,
             interpret: bool):
    b = rays8.shape[1]
    tpp = aabb_t.shape[0]
    wp = tpp // 32
    k1p = -(-k1 // 8) * 8  # sublane-pad the tiny output dims
    wpp = -(-wp // 8) * 8
    nsteps = b // L
    vma = vma_union(rays8, aabb_t, s)
    rays8 = cast_to_vma(rays8, vma)
    aabb_t = cast_to_vma(aabb_t, vma)
    s = cast_to_vma(s, vma)
    tids, res, counts = pl.pallas_call(
        functools.partial(_kernel_pop, tpp, tmin, k1),
        grid=(nsteps,),
        in_specs=[
            pl.BlockSpec((8, L), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((tpp, 128), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2 * wp, tpp), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, k1p, L), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, wpp, L), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tpp, 128), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((nsteps, k1p, L), jnp.int32, vma=vma),
            jax.ShapeDtypeStruct((nsteps, wpp, L), jnp.uint32, vma=vma),
            jax.ShapeDtypeStruct((tpp, 128), jnp.float32, vma=vma),
        ],
        interpret=pltpu.InterpretParams() if interpret else False,
    )(rays8, aabb_t, s)

    w = tp // 32
    tid = tids[:, :k1, :].transpose(1, 0, 2).reshape(k1, nsteps * L)
    m = res[:, :w, :].transpose(1, 0, 2).reshape(w, nsteps * L)
    return tid, m, counts[:tp, 0].astype(jnp.int32)


@functools.lru_cache(maxsize=8)
def _pack_s_halves(tpp: int) -> "jnp.ndarray":
    """(2*Wp, Tpp) power-of-two selection matrix, half-grouped layout:
    rows [0, Wp) collect the LOW 16 bits of every word, rows [Wp, 2*Wp)
    the HIGH 16 -- the pop kernel reassembles u32 words with two
    contiguous sublane slices."""
    wp = tpp // 32
    s = np.zeros((2 * wp, tpp), np.float32)
    for w in range(wp):
        for h in range(2):
            for k in range(16):
                s[h * wp + w, 32 * w + 16 * h + k] = float(1 << k)
    return jnp.asarray(s)


def cull_pop_pallas(ro, rd, ga, tmin: float, k1: int,
                    interpret: bool = False):
    """Fused replacement for ``_cull_bits`` + ``_pop_k(words, k1)`` on TPU:
    returns (tid (k1, B) i32 | -1, residual words (W, B) u32, full counts
    (Tp,) i32), bit-identical to the XLA pair (pinned by
    tests/test_pallas_grouped.py in interpret mode)."""
    aabb_t = ga.aabb_t
    s = _pack_s_halves(aabb_t.shape[0])
    b = ro.x.shape[0]
    pad = (-b) % L
    zero = ro.x * 0.0

    def p(c, fill):
        c = c + zero  # unify vma before concat
        if pad:
            return jnp.concatenate([c, jnp.full((pad,), fill, c.dtype)])
        return c

    rays8 = jnp.stack(
        [p(ro.x, 1e30), p(ro.y, 1e30), p(ro.z, 1e30),
         p(rd.x, 1.0), p(rd.y, 1.0), p(rd.z, 1.0),
         p(zero, 0.0), p(zero, 0.0)]
    )
    tp = ga.aabb.shape[1]
    tid, m, counts = _run_pop(rays8, aabb_t, s, tp, float(tmin), k1,
                              interpret)
    return tid[:, :b], m[:, :b], counts


def pack_aabb_t(aabb: np.ndarray) -> np.ndarray:
    """Host-side (scene-build-time) pre-transposed treelet boxes:
    (Tpp, 128) with the six box planes in columns 0-5, NaN padding rows
    beyond Tp (never hit -- NaN poisons every slab comparison, matching
    ops.grouped.build_grouped's padding contract)."""
    tp = aabb.shape[1]
    tpp = 128 * (-(-tp // 128))
    aabb_t = np.full((tpp, 128), np.nan, np.float32)
    aabb_t[:tp, :6] = np.asarray(aabb, np.float32).T
    return aabb_t


@functools.lru_cache(maxsize=8)
def _pack_s(tpp: int) -> "jnp.ndarray":
    """The (2*Wp, Tpp) power-of-two selection matrix (module doc) -- a
    pure function of the padded treelet count, built at trace time."""
    wp = tpp // 32
    s = np.zeros((2 * wp, tpp), np.float32)
    for w in range(wp):
        for h in range(2):
            for k in range(16):
                s[2 * w + h, 32 * w + 16 * h + k] = float(1 << k)
    return jnp.asarray(s)


def cull_bits_pallas(ro, rd, ga, tmin: float, interpret: bool = False):
    """Drop-in for ops.grouped._cull_bits on TPU (bit-identical words and
    counts). Requires ``ga.aabb_t`` (built by ops.grouped.build_grouped)."""
    aabb_t = ga.aabb_t
    s = _pack_s(aabb_t.shape[0])
    b = ro.x.shape[0]
    pad = (-b) % L
    zero = ro.x * 0.0

    def p(c, fill):
        c = c + zero  # unify vma before concat
        if pad:
            return jnp.concatenate([c, jnp.full((pad,), fill, c.dtype)])
        return c

    rays8 = jnp.stack(
        [p(ro.x, 1e30), p(ro.y, 1e30), p(ro.z, 1e30),
         p(rd.x, 1.0), p(rd.y, 1.0), p(rd.z, 1.0),
         p(zero, 0.0), p(zero, 0.0)]
    )
    tp = ga.aabb.shape[1]
    words, counts = _run(rays8, aabb_t, s, tp, float(tmin), interpret)
    return words[:, :b], counts
