"""Sorted-pair grouped traversal -- the big all-triangle-scene fast path.

Replaces the reference's recursive nearest-hit BVH walk
(/root/reference/src/bvh.rs:231-297) for 100k+ triangle glTF scenes with a
TPU-shaped EXHAUSTIVE pipeline built on the one data-movement primitive
this hardware does near speed-of-light: ``lax.sort`` with payload columns
(whose cost is mostly FIXED per call -- measured ~3.3-5.4 ms for 262k-1.3M
rows x 8 columns on v5e -- while 1M-row gather/scatter/cumsum all cost
~5-16 ms).

Design history (all measured on v5e, see git history + TODO.md): round 2
built a nearest-first K-extraction main pass with a compacted straggler
finish, betting that entry-ordered pruning keeps the tested-pair count
small. Round-3 measurements killed it: on incoherent bounce-ray batches a
ray's segment crosses mean 7-16 treelet AABBs (SLOTS=128: mean 15, p95 33)
and 60%+ of rays overflow any small K, so the per-ray straggler loops
dominated end-to-end (457 ms per 262k-ray batch vs 153 ms for the treelet
wavefront). The pruning machinery cost more than the work it saved --
sorts are fixed-cost, so testing MORE pairs in one sweep is nearly free,
while per-ray loops to test FEWER pairs are ruinous.

The shipped design is therefore exhaustive: every treelet whose AABB the
ray's segment crosses is block-tested exactly once, nothing is ordered or
pruned, and the result provably equals the dense sweep's nearest hit.

Pipeline per bounce (all static shapes):

1. CULL     -- one fused slab pass over the (B, Tp) treelet AABBs ->
   per-ray hit-bit words (B, W) u32 + per-treelet ray counts.
2. EXTRACT  -- pop the first K1 set bits per ray (cheap word ops: x & -x
   + exponent trick; NO (B, Tp) min-ordering passes). Rays with more than
   K1 crossings are compacted ONCE (capacity B // CAP2_DIV) and pop up to
   K2 more bits as "virtual rays" whose pair rows join the SAME sort --
   sorts are ~fixed-cost, so the extra rows are nearly free while a
   separate straggler sweep pays its own sorts + fill. Only rays beyond
   the compaction capacity or with more than K1+K2 crossings (measured
   p100 is ~32 = K1+K2 on the course meshes) drain through small
   residual waves afterwards.
3. FILL     -- ``(-count) % BLOCK`` filler pairs per treelet make every
   treelet's pair segment a BLOCK multiple: after sorting, EVERY block of
   BLOCK pairs holds exactly one treelet id.
4. SORT#1   -- one ``lax.sort`` over (key=tid, rayid, ro.xyz, rd.xyz);
   sentinel rows (unused extraction slots) sort to the tail as whole
   blocks.
5. TEST     -- per block: the treelet's precomputed MT coefficient tile
   against all BLOCK rays -- ONE MXU matmul in the Pallas kernel
   (ops/pallas_grouped.py, scalar-prefetch DMA + double buffering) on
   real TPU, a VPU sweep otherwise. Sentinel blocks are skipped.
6. SORT#2   -- ``lax.sort`` by rayid: real rays contributed exactly K1
   rows and virtuals exactly K2, so the sorted prefix reshapes to
   (B, K1) / (cap2, K2) -> per-ray min, then a tiny scatter-merge of the
   virtual tier.

SLOTS (treelet capacity) tunes the workload shape: bigger treelets mean
fewer, bigger cells -- the cull shrinks ~linearly, while each visited
cell costs more (MXU-cheap) slot tests. Post-padding-fix crossing counts
on practice7_3 bounce rays are nearly IDENTICAL at SLOTS=128 and 256
(mean 2.4 / p95 5 / p99 12 / max ~32 -- the earlier "mean 15 vs 7" split
was an artifact of padding treelets hitting as a unit box), so SLOTS
mainly trades cull+pop cost (scales with Tp) against block-test flops
(scale with SLOTS). RT_SLOTS selects; the kd partition (RT_PARTITION=kd)
measured worse at every setting and stays A/B-able.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..scene.types import SceneArrays, SceneStatics
from .intersect import DIR_BIAS, INF, ray_triangle
from .scene_intersect import SceneHit, _fold_in_planes
from .vec import Vec3

BLOCK = 128  # pairs per single-treelet block (= one geometry tile fetch)
# Tier sizing (RT_K1/RT_K2/RT_CAP2_DIV override). True bounce-ray crossing
# counts on practice7_3 after the padding-column fix: mean 2.4 / p85 3 /
# p95 5 / p99 11-12 / max ~32 at BOTH SLOTS=128 and 256 (the pre-fix
# "mean 10.5 / p95 31" was 68% empty padding treelets). K1 covers ~p92;
# the compacted virtual tier (capacity B // CAP2_DIV) takes the tail and
# K2 >= max-K1 crossings finishes every straggler in ONE round -- the old
# oversized tier (K1=6/K2=12/div=4: 65k wave lanes for ~6k stragglers,
# multi-round inner loop) measured 59.2 ms/262k-bounce vs 33.0 for this
# sizing on practice7_3 bounce rays (v5e, chained).
K1 = 4  # hit-bits popped per ray in the main tier (~p92)
K2 = 28  # bits popped per compacted virtual ray per tier-2 round
CAP2_DIV = 8  # virtual-tier width = B // CAP2_DIV, rounded to BLOCK.
# Engine mixes run ~8-10% stragglers at K1=4 (bounce rays >4 crossings
# 7-8%, fresh primaries 9.4% on practice7_3) -- B/8 keeps the whole tail
# in the ONE combined sweep; B/16 overflowed it in-engine and every
# bounce paid residual waves.
K2B = 0  # optional THIRD static tier riding the same sweep: rays still
# carrying bits after K1+K2 are re-compacted (capacity B // CAP2B_DIV)
# and pop K2B more. With (K1=4, K2=8, K2B=20) the p99 tail (5-12
# crossings) fits tier 2 and the p100 tail (<= 32) fits tier 2b, cutting
# total sort/test rows ~35% vs K2=28 (rows = B*(K1 + K2/CAP2_DIV +
# K2B/CAP2B_DIV)) while the steady state stays wave-free. Default OFF
# (0) until the hardware A/B lands (RT_K2B/RT_CAP2B_DIV select).
CAP2B_DIV = 64


def _k2b() -> int:
    import os

    return int(os.environ.get("RT_K2B", str(K2B)))


def _cap2b_div() -> int:
    import os

    return int(os.environ.get("RT_CAP2B_DIV", str(CAP2B_DIV)))


def _k1() -> int:
    import os

    return int(os.environ.get("RT_K1", str(K1)))


def _k2() -> int:
    import os

    return int(os.environ.get("RT_K2", str(K2)))


def _cap2_div() -> int:
    import os

    return int(os.environ.get("RT_CAP2_DIV", str(CAP2_DIV)))


class GroupedArrays(NamedTuple):
    """Per-scene constants for the grouped traversal (built in ops.bvh).

    SLOTS (triangle slots per treelet) is derived from shapes
    (``geom_rows.shape[1] // 9``) so the tuple stays a pure array pytree."""

    aabb: "jnp.ndarray"  # (6, Tp) f32 [minx,miny,minz,maxx,maxy,maxz];
    # padding treelets carry NaN bounds: never hit (NaN poisons every
    # slab comparison; an inverted min>max box would NOT work -- the
    # slab min/max re-sorts the planes back into a valid box).
    geom_rows: "jnp.ndarray"  # (Tp, 9 * SLOTS) f32: per-treelet packed
    # triangle planes [p0x|p0y|p0z|p1x|...|p2z], each (SLOTS,); one row
    # gather per block in the XLA fallback test.
    geom_w: "jnp.ndarray" = None  # (Tp, 24, 4*SLOTS) f32 centroid-local MT
    # coefficient tiles (ops/mt_pack.py) for the Pallas MXU block test:
    # rows 0-15 = coefficients (cols component-major [det|udet|vdet|tdet],
    # each (SLOTS,)), row 16 = treelet centroid (cols 0-2), rows 17-23 pad.
    aabb_t: "jnp.ndarray" = None  # (Tpp, 128) pre-transposed boxes for the
    # fused Pallas cull (ops/pallas_cull.py): six planes in cols 0-5,
    # NaN padding rows beyond Tp.


def build_grouped(tl_aabb: np.ndarray, blocks: np.ndarray) -> GroupedArrays:
    """From ops.treelet/bvh arrays: aabb (6, T) + blocks (9, T, SLOTS)."""
    from .mt_pack import mt_w_matrices

    t = tl_aabb.shape[1]
    slots = blocks.shape[2]
    tp = 32 * (-(-t // 32))
    if tp > 2048:
        raise ValueError(
            f"grouped traversal supports <= 2048 treelets (got {tp}); "
            "raise TREELET_SLOTS or KD_CELL"
        )
    # Padding columns are NaN: the slab test's per-axis min/max SORTS the
    # two plane distances, so an "inverted" min>max box degenerates to its
    # normalized box, NOT to never-hit -- a round-3 bug that made the
    # padding columns behave like a unit box at the origin and inflated
    # measured crossing counts from mean ~3.3 to ~10.4 on practice7_3
    # (68% of all block tests were empty padding treelets). NaN poisons
    # lo/hi so every comparison is False on every padding column.
    aabb = np.full((6, tp), np.nan, np.float32)
    aabb[:, :t] = np.asarray(tl_aabb, np.float32)
    geom = np.zeros((tp, 9 * slots), np.float32)
    geom[:t] = np.asarray(blocks, np.float32).transpose(1, 0, 2).reshape(t, 9 * slots)

    # MXU tiles: per-treelet (16, 4*SLOTS) MT coefficients in the treelet's
    # AABB-center frame (precision: mt_pack.py docstring). Fill slots are
    # zero triangles -> after the centroid shift all three verts coincide
    # -> det == 0 -> never valid.
    c = (np.asarray(tl_aabb[:3], np.float64) + np.asarray(tl_aabb[3:], np.float64)) * 0.5  # (3, T)
    bl = np.asarray(blocks, np.float64)  # (9, T, S)
    verts = []
    for k in range(3):
        v = bl[3 * k : 3 * k + 3] - c[:, :, None]  # (3, T, S) local
        verts.append(np.moveaxis(v, 0, -1).reshape(t * slots, 3))
    w = mt_w_matrices(*verts)  # (T*S, 16, 4) f32
    w = w.reshape(t, slots, 16, 4).transpose(0, 2, 3, 1).reshape(t, 16, 4 * slots)
    from .pallas_grouped import CEN_ROW, W_ROWS

    geom_w = np.zeros((tp, W_ROWS, 4 * slots), np.float32)
    geom_w[:t, :16] = w
    geom_w[:t, CEN_ROW, 0:3] = c.T
    from .pallas_cull import pack_aabb_t

    return GroupedArrays(
        aabb=np.ascontiguousarray(aabb), geom_rows=geom, geom_w=geom_w,
        aabb_t=pack_aabb_t(aabb),
    )


# ---------------------------------------------------------------------------
# stage 1: fused slab cull -> (B, W) hit words + per-treelet counts
# ---------------------------------------------------------------------------


def _slab_lo_hi(ro: Vec3, rd: Vec3, aabb):
    """Entry/exit distances of rays (B,) against boxes (6, T) -> (B, T).

    Same DIR_BIAS as ops.intersect.ray_box_interval so the grouped path
    visits exactly the treelets the wavefront path visits."""
    inv = (
        1.0 / (rd.x + DIR_BIAS),
        1.0 / (rd.y + DIR_BIAS),
        1.0 / (rd.z + DIR_BIAS),
    )
    o = (ro.x, ro.y, ro.z)
    lo = None
    hi = None
    for ax in range(3):
        a = (aabb[ax][None, :] - o[ax][:, None]) * inv[ax][:, None]
        b = (aabb[3 + ax][None, :] - o[ax][:, None]) * inv[ax][:, None]
        l, h = jnp.minimum(a, b), jnp.maximum(a, b)
        lo = l if lo is None else jnp.maximum(lo, l)
        hi = h if hi is None else jnp.minimum(hi, h)
    return lo, hi


def _cull_bits(ro: Vec3, rd: Vec3, ga: "GroupedArrays", tmin):
    """(words (W, B) u32 crossing bits, counts (Tp,) i32 rays per treelet).

    Words are stored WORD-MAJOR: a (B, W) layout lane-pads the tiny W
    minor dim to 128 and every pop pass pays 7x (measured: the pop stage
    cost 21 ms/bounce in (B, W) vs ~2 ms word-major).

    On TPU the fused Pallas kernel (ops/pallas_cull.py) produces
    bit-identical words/counts without materializing the (B, Tp) slab
    intermediates in HBM."""
    import os

    if (
        jax.default_backend() == "tpu"
        and not os.environ.get("RT_NO_PALLAS")
        and getattr(ga, "aabb_t", None) is not None
        and isinstance(tmin, (int, float))
    ):
        from .pallas_cull import cull_bits_pallas

        return cull_bits_pallas(ro, rd, ga, float(tmin))
    b = ro.x.shape[0]
    tp = ga.aabb.shape[1]
    w = tp // 32
    lo, hi = _slab_lo_hi(ro, rd, ga.aabb)
    hit = (lo <= hi) & (hi > tmin)  # (B, Tp)
    counts = jnp.sum(hit, axis=0, dtype=jnp.int32)  # (Tp,)
    return _pack_words(hit), counts


def _pack_words(hit):
    """(B, Tp) bool -> (W, B) u32 bit words."""
    b, tp = hit.shape
    hitb = hit.reshape(b, tp // 32, 32).astype(jnp.uint32)
    shifts = (jnp.uint32(1) << jnp.arange(32, dtype=jnp.uint32))[None, None, :]
    return jnp.sum(hitb * shifts, axis=2, dtype=jnp.uint32).T


def _count_rows(m, tp):
    """Per-treelet popcount over rays: (Tp,) i32 from (W, B) words."""
    shifts = jnp.arange(32, dtype=jnp.uint32)
    bits = (m[:, None, :] >> shifts[None, :, None]) & jnp.uint32(1)
    return jnp.sum(bits, axis=2, dtype=jnp.int32).reshape(tp)  # (W*32,)


# ---------------------------------------------------------------------------
# stage 2: pop set bits (word-major (B,)-row ops only)
# ---------------------------------------------------------------------------


def _pop_lowest(m):
    """Pop each ray's lowest set bit: (tid (B,) i32 | -1, m' (W, B)).

    Shallow parallel form (a word-ordered sequential scan compiled
    pathologically -- a ~W*k-deep dependency chain): per word x & -x
    isolates its lowest bit, a masked-min reduce picks the first nonempty
    word, and the f32 exponent recovers the bit index (exact: the isolated
    bit is a power of two)."""
    w = m.shape[0]
    low_w = m & (jnp.uint32(0) - m)  # (W, B)
    has_w = m != jnp.uint32(0)
    iw = jax.lax.broadcasted_iota(jnp.int32, m.shape, 0)
    wsel = jnp.min(jnp.where(has_w, iw, w), axis=0)  # (B,) first word
    sel = iw == wsel[None, :]
    low = jnp.sum(jnp.where(sel, low_w, jnp.uint32(0)), axis=0, dtype=jnp.uint32)
    e = (
        jax.lax.shift_right_logical(
            jax.lax.bitcast_convert_type(low.astype(jnp.float32), jnp.int32),
            23,
        )
        - 127
    )
    tid = jnp.where(wsel < w, wsel * 32 + e, -1)
    m2 = m ^ jnp.where(sel, low_w, jnp.uint32(0))
    return tid, m2


def _pop_k(m, k: int):
    """First k set bits per ray: (tids (k, B) i32 | -1, m' (W, B))."""
    tids = []
    for _ in range(k):
        tid, m = _pop_lowest(m)
        tids.append(tid)
    return jnp.stack(tids), m


# ---------------------------------------------------------------------------
# stage 5: dense single-treelet block test (XLA fallback; the TPU path is
# ops/pallas_grouped.block_mt_pallas)
# ---------------------------------------------------------------------------


def _block_mt(geom_rows, block_tid, prx, slots, tmin):
    """MT-test each block of BLOCK pairs against its treelet's SLOTS tris.

    block_tid: (NB,) i32; prx: 6 ray component arrays (NB, BLOCK).
    Returns (t (NB, BLOCK), slot (NB, BLOCK) i32)."""
    tp = geom_rows.shape[0]
    g = jnp.take(geom_rows, jnp.clip(block_tid, 0, tp - 1), axis=0)
    g = g.reshape(g.shape[0], 9, slots)  # (NB, 9, SLOTS)

    def plane(i):
        return g[:, i, :][:, None, :]  # (NB, 1, SLOTS)

    def rayc(i):
        return prx[i][:, :, None]  # (NB, BLOCK, 1)

    a = Vec3(plane(0), plane(1), plane(2))
    b_ = Vec3(plane(3), plane(4), plane(5))
    c = Vec3(plane(6), plane(7), plane(8))
    ro = Vec3(rayc(0), rayc(1), rayc(2))
    rd = Vec3(rayc(3), rayc(4), rayc(5))
    t, _, _, valid = ray_triangle(ro, rd, a, b_, c)
    t = jnp.where(valid & (t > tmin), t, INF)
    slot = jnp.argmin(t, axis=2).astype(jnp.int32)
    return jnp.min(t, axis=2), slot


def _test_blocks(ga: "GroupedArrays", block_tid, prx, slots, tp, tmin):
    import os

    use_pallas = (
        jax.default_backend() == "tpu"
        and not os.environ.get("RT_NO_PALLAS")
        and ga.geom_w is not None
        and isinstance(tmin, (int, float))
    )
    if use_pallas:
        from .pallas_grouped import block_mt_pallas

        return block_mt_pallas(
            block_tid, tuple(prx), ga.geom_w, slots, tp, float(tmin),
            precision=os.environ.get("RT_MT_PRECISION", "highest"),
        )
    return _block_mt(ga.geom_rows, block_tid, prx, slots, tmin)


# ---------------------------------------------------------------------------
# the traversal
# ---------------------------------------------------------------------------


def _sweep(ga, tid_col, ray_col, comp_cols, counts, slots, tp, tmin,
           n_groups):
    """Sort flat (tid, group, ray) pair rows into single-treelet blocks,
    test, sort back by group id. ``tid_col``/``ray_col``/``comp_cols`` are
    flat (R,) columns; sentinel rows carry tid -1. Returns (t, idx) flat,
    sorted ascending by group id (fill rows, group == n_groups, at the
    tail) -- the caller slices by its known rows-per-group layout."""
    sentinel_key = jnp.int32(tp + 1)
    fill_n = (-counts) % BLOCK  # (Tp,)
    filler_key = jnp.where(
        jnp.arange(BLOCK, dtype=jnp.int32)[None, :] < fill_n[:, None],
        jnp.arange(tp, dtype=jnp.int32)[:, None],
        sentinel_key,
    ).reshape(-1)  # (Tp * BLOCK,)
    nfill = tp * BLOCK

    key = jnp.where(tid_col >= 0, tid_col, sentinel_key)
    key = jnp.concatenate([key, filler_key])
    ray_col = jnp.concatenate(
        [ray_col, jnp.full((nfill,), n_groups, jnp.int32)]
    )

    def cfill(c):
        return jnp.concatenate([c, jnp.zeros((nfill,), c.dtype)])

    sorted_cols = jax.lax.sort(
        (key, ray_col) + tuple(cfill(c) for c in comp_cols), num_keys=1
    )
    s_key, s_ray = sorted_cols[0], sorted_cols[1]
    s_comps = sorted_cols[2:]

    nb = s_key.shape[0] // BLOCK
    block_tid = s_key.reshape(nb, BLOCK)[:, 0]
    prx = [c.reshape(nb, BLOCK) for c in s_comps]
    t_pair, slot_pair = _test_blocks(ga, block_tid, prx, slots, tp, tmin)
    real = (block_tid < tp)[:, None] & (s_ray.reshape(nb, BLOCK) < n_groups)
    t_pair = jnp.where(real, t_pair, INF)
    idx_pair = jnp.clip(block_tid, 0, tp - 1)[:, None] * slots + slot_pair

    # back to group-major order
    _, r_t, r_idx = jax.lax.sort(
        (s_ray, t_pair.reshape(-1), idx_pair.reshape(-1)), num_keys=1
    )
    return r_t, r_idx


def _row_min(t_bk, i_bk):
    """(G, k) -> per-group (t, idx) min via a static where-chain."""
    best_t = t_bk[:, 0]
    best_idx = i_bk[:, 0]
    for j in range(1, t_bk.shape[1]):
        better = t_bk[:, j] < best_t
        best_idx = jnp.where(better, i_bk[:, j], best_idx)
        best_t = jnp.where(better, t_bk[:, j], best_t)
    return best_t, best_idx


def nearest_hit_grouped(
    ro: Vec3, rd: Vec3, scn: SceneArrays, statics: SceneStatics, tmin=0.0
) -> SceneHit:
    """Exhaustive nearest hit over the treelet-partitioned triangle table
    (module doc): every crossed treelet is block-tested exactly once, so
    the result equals the dense sweep's nearest hit."""
    k1 = _k1()
    k2 = _k2()
    b_in = ro.x.shape[0]
    lane_mult = BLOCK // np.gcd(k1, BLOCK)
    pad = (-b_in) % lane_mult  # K1*B must be a BLOCK multiple
    if pad:

        def p(c):  # pad rays that hit nothing: distant origin, unit dir
            return jnp.concatenate([c, jnp.full((pad,), 1e30, c.dtype)])

        out = nearest_hit_grouped(
            Vec3(p(ro.x), p(ro.y), p(ro.z)),
            Vec3(p(rd.x), p(rd.y), p(rd.z)),
            scn,
            statics,
            tmin,
        )
        return SceneHit(
            out.t[:b_in], out.idx[:b_in], out.is_plane[:b_in], out.valid[:b_in]
        )

    ga: GroupedArrays = scn.bvh.grouped
    slots = ga.geom_rows.shape[1] // 9
    tp = ga.aabb.shape[1]
    b = b_in
    cap2 = max(((b // _cap2_div()) // BLOCK) * BLOCK, BLOCK)

    # 1 + 2a. cull -> crossing bits + full per-treelet counts, then pop the
    # first K1 crossings per ray. On TPU both run fused in one Pallas
    # kernel (ops/pallas_cull.cull_pop_pallas): the packed words stay in
    # VMEM through the pop and only the k1 tids + the residual words reach
    # HBM (RT_CULL_POP=0 opts back to cull kernel + XLA pop).
    import os as _os

    if (
        jax.default_backend() == "tpu"
        and not _os.environ.get("RT_NO_PALLAS")
        and _os.environ.get("RT_CULL_POP", "1") != "0"
        and getattr(ga, "aabb_t", None) is not None
        and isinstance(tmin, (int, float))
    ):
        from .pallas_cull import cull_pop_pallas

        tid_k1, m, full_counts = cull_pop_pallas(ro, rd, ga, float(tmin), k1)
    else:
        words, full_counts = _cull_bits(ro, rd, ga, tmin)
        tid_k1, m = _pop_k(words, k1)
    counts1 = full_counts - _count_rows(m, tp)

    # 2b. straggler tier, SAME sweep: rays with more than K1 crossings are
    # compacted ONCE and pop up to K2 more bits as "virtual rays" whose
    # pair rows ride the SAME two sorts as the main tier (group ids
    # b..b+cap2). This replaces the round-3 separate straggler waves (own
    # sort1/test/sort2 + best_t re-cull + multi-round inner while): sorts
    # are ~fixed-cost, so the extra K2*cap2 mostly-sentinel rows price
    # ~2 ms at 262k lanes while a separate 16k-lane wave priced ~14 ms --
    # and engine mixes whose straggler count overflows one wave's cap no
    # longer double the tail cost (measured 33.0 -> see ROUNDLOG).
    has_more = jnp.any(m != 0, axis=0)
    idx2 = jnp.nonzero(has_more, size=cap2, fill_value=b)[0]
    safe2 = jnp.minimum(idx2, b - 1)
    live2 = idx2 < b
    sub_m = jnp.where(live2[None, :], m[:, safe2], jnp.uint32(0))
    tid_k2, sub_rem = _pop_k(sub_m, k2)
    counts2 = _count_rows(sub_m, tp) - _count_rows(sub_rem, tp)

    comps = (ro.x, ro.y, ro.z, rd.x, rd.y, rd.z)
    sub_c = tuple(jnp.where(live2, c[safe2], 0.0) for c in comps)
    ray_main = jnp.broadcast_to(
        jnp.arange(b, dtype=jnp.int32)[None, :], (k1, b)
    ).reshape(-1)
    ray_virt = jnp.broadcast_to(
        b + jnp.arange(cap2, dtype=jnp.int32)[None, :], (k2, cap2)
    ).reshape(-1)
    tid_parts = [tid_k1.reshape(-1), tid_k2.reshape(-1)]
    ray_parts = [ray_main, ray_virt]
    comp_parts = [
        (
            jnp.broadcast_to(c[None, :], (k1, b)).reshape(-1),
            jnp.broadcast_to(s[None, :], (k2, cap2)).reshape(-1),
        )
        for c, s in zip(comps, sub_c)
    ]
    counts_all = counts1 + counts2

    # 2c. optional tier-2b (module doc): rays still carrying bits after
    # K1+K2 re-compact (from the tier-2 compacted space) and pop K2B more
    # bits into the SAME sweep, keeping the steady state wave-free at a
    # much smaller row budget than a fat K2.
    k2b = _k2b()
    cap2b = (
        max(((b // _cap2b_div()) // BLOCK) * BLOCK, BLOCK) if k2b else 0
    )
    if k2b:
        has_more2 = jnp.any(sub_rem != 0, axis=0) & live2  # (cap2,)
        idx2b = jnp.nonzero(has_more2, size=cap2b, fill_value=cap2)[0]
        safe2b = jnp.minimum(idx2b, cap2 - 1)
        live2b = idx2b < cap2
        sub_m2 = jnp.where(live2b[None, :], sub_rem[:, safe2b], jnp.uint32(0))
        tid_k2b, sub_rem2 = _pop_k(sub_m2, k2b)
        counts_all = counts_all + (
            _count_rows(sub_m2, tp) - _count_rows(sub_rem2, tp)
        )
        sub_c2 = tuple(jnp.where(live2b, s[safe2b], 0.0) for s in sub_c)
        tid_parts.append(tid_k2b.reshape(-1))
        ray_parts.append(
            jnp.broadcast_to(
                b + cap2 + jnp.arange(cap2b, dtype=jnp.int32)[None, :],
                (k2b, cap2b),
            ).reshape(-1)
        )
        comp_parts = [
            parts + (jnp.broadcast_to(s2[None, :], (k2b, cap2b)).reshape(-1),)
            for parts, s2 in zip(comp_parts, sub_c2)
        ]

    tid_col = jnp.concatenate(tid_parts)
    ray_col = jnp.concatenate(ray_parts)
    comp_cols = tuple(jnp.concatenate(parts) for parts in comp_parts)
    t_flat, i_flat = _sweep(
        ga, tid_col, ray_col, comp_cols, counts_all, slots, tp,
        tmin, b + cap2 + cap2b,
    )
    best_t, best_idx = _row_min(
        t_flat[: k1 * b].reshape(b, k1), i_flat[: k1 * b].reshape(b, k1)
    )
    v_t, v_i = _row_min(
        t_flat[k1 * b : k1 * b + k2 * cap2].reshape(cap2, k2),
        i_flat[k1 * b : k1 * b + k2 * cap2].reshape(cap2, k2),
    )
    take = live2 & (v_t < best_t[safe2])
    best_t = best_t.at[idx2].set(
        jnp.where(take, v_t, best_t[safe2]), mode="drop"
    )
    best_idx = best_idx.at[idx2].set(
        jnp.where(take, v_i, best_idx[safe2]), mode="drop"
    )
    if k2b:
        # merge AFTER tier 2 so tier-2b rows compare against the
        # post-tier-2 best of their ray
        off = k1 * b + k2 * cap2
        v2b_t, v2b_i = _row_min(
            t_flat[off : off + k2b * cap2b].reshape(cap2b, k2b),
            i_flat[off : off + k2b * cap2b].reshape(cap2b, k2b),
        )
        orig = jnp.where(live2b, idx2[safe2b], b)  # original ray ids
        orig_safe = jnp.minimum(orig, b - 1)
        take2b = live2b & (v2b_t < best_t[orig_safe])
        best_t = best_t.at[orig].set(
            jnp.where(take2b, v2b_t, best_t[orig_safe]), mode="drop"
        )
        best_idx = best_idx.at[orig].set(
            jnp.where(take2b, v2b_i, best_idx[orig_safe]), mode="drop"
        )

    # residual waves (rare): stragglers that overflowed the cap2/cap2b
    # compactions, or carried more than K1+K2(+K2B) crossings, drain
    # through compacted best_t-pruned waves. ``m`` stays READ-ONLY (a
    # minor-axis scatter back into the (W, B) words lowered to a
    # catastrophic (cap2, B) dynamic-update-slice), so progress is tracked
    # by a (B,) processed flag; a re-compacted overflow ray re-pops from
    # ``m`` and re-tests its tier-2(+2b) treelets -- idempotent for an
    # exhaustive min.
    if k2b:
        drained2b = jnp.zeros((cap2,), bool).at[idx2b].set(
            live2b & ~jnp.any(sub_rem2 != 0, axis=0), mode="drop"
        )
        over2 = jnp.any(sub_rem != 0, axis=0) & live2 & ~drained2b
    else:
        over2 = jnp.any(sub_rem != 0, axis=0) & live2
    over = jnp.zeros((b,), bool).at[idx2].set(over2, mode="drop")
    compacted = jnp.zeros((b,), bool).at[idx2].set(live2, mode="drop")
    processed = (~has_more) | (compacted & ~over)
    cap3 = max(((b // 64) // BLOCK) * BLOCK, BLOCK)
    k3 = 32

    def waves_left(state):
        processed, _, _ = state
        return ~jnp.all(processed)

    def wave(state):
        processed, best_t, best_idx = state
        idx2 = jnp.nonzero(~processed, size=cap3, fill_value=b)[0]
        safe2 = jnp.minimum(idx2, b - 1)
        live2 = idx2 < b
        sub_m0 = jnp.where(live2[None, :], m[:, safe2], jnp.uint32(0))
        processed = processed.at[idx2].set(True, mode="drop")
        sub_c = tuple(jnp.where(live2, c[safe2], 0.0) for c in comps)
        # prune the compacted rays' unpopped crossings against the main
        # pass's best hit: a treelet whose entry distance lies beyond
        # best_t cannot improve the nearest hit (the reference's pruning
        # rule, src/bvh.rs:258-262). Done HERE, on the (cap2, Tp) compacted
        # rows, instead of a full (B, Tp) pass -- only the >K1-crossing
        # tail (~5-10% of rays at K1=6 on practice7_3) ever needs it.
        lo2, hi2 = _slab_lo_hi(
            Vec3(sub_c[0], sub_c[1], sub_c[2]),
            Vec3(sub_c[3], sub_c[4], sub_c[5]),
            ga.aabb,
        )
        keep2 = (
            (lo2 <= hi2)
            & (hi2 > tmin)
            & (jnp.maximum(lo2, 0.0) <= best_t[safe2][:, None])
        )
        sub_m0 = sub_m0 & _pack_words(keep2)
        ray_v = jnp.broadcast_to(
            jnp.arange(cap3, dtype=jnp.int32)[None, :], (k3, cap3)
        ).reshape(-1)
        scomps = tuple(
            jnp.broadcast_to(c[None, :], (k3, cap3)).reshape(-1)
            for c in sub_c
        )

        def rounds_left(st):
            sub_m, _, _ = st
            return jnp.any(sub_m != 0)

        def one_round(st):
            sub_m, w_t, w_i = st
            before = _count_rows(sub_m, tp)
            tid_k3, sub_m = _pop_k(sub_m, k3)
            emitted = before - _count_rows(sub_m, tp)
            t_flat, i_flat = _sweep(
                ga, tid_k3.reshape(-1), ray_v, scomps, emitted, slots, tp,
                tmin, cap3,
            )
            r_t, r_i = _row_min(
                t_flat[: k3 * cap3].reshape(cap3, k3),
                i_flat[: k3 * cap3].reshape(cap3, k3),
            )
            better = r_t < w_t
            return (
                sub_m,
                jnp.where(better, r_t, w_t),
                jnp.where(better, r_i, w_i),
            )

        # vma-consistent inits under shard_map; the isfinite guard matters:
        # best_t is INF for rays with no hit in the main tier, and INF*0
        # is NaN, which would poison every (v_t < cur_t) take below
        bts = best_t[safe2]
        zero2 = jnp.where(jnp.isfinite(bts), bts, 0.0) * 0.0
        _, v_t, v_i = jax.lax.while_loop(
            rounds_left,
            one_round,
            (sub_m0, zero2 + INF, zero2.astype(jnp.int32)),
        )
        cur_t = best_t[safe2]
        take = live2 & (v_t < cur_t)
        best_t = best_t.at[idx2].set(jnp.where(take, v_t, cur_t), mode="drop")
        best_idx = best_idx.at[idx2].set(
            jnp.where(take, v_i, best_idx[safe2]), mode="drop"
        )
        return processed, best_t, best_idx

    processed, best_t, best_idx = jax.lax.while_loop(
        waves_left, wave, (processed, best_t, best_idx)
    )

    out = SceneHit(
        best_t,
        best_idx.astype(jnp.int32),
        jnp.zeros_like(best_idx, bool),
        jnp.isfinite(best_t),
    )
    if statics.num_planes > 0:
        out = _fold_in_planes(ro, rd, scn, out, tmin)
    return out
