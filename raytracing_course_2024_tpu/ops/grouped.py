"""Sorted-pair grouped traversal -- the big all-triangle-scene fast path.

Replaces the reference's recursive nearest-hit BVH walk
(/root/reference/src/bvh.rs:231-297) for 100k+ triangle glTF scenes with a
TPU-shaped pipeline built on the one data-movement primitive this hardware
does near speed-of-light: ``lax.sort`` with payload columns (measured
~4 ms for 1M rows x 8 columns on v5e, vs ~10 ms for ANY 1M-row gather,
scatter or cumsum -- see the chained microbenchmarks in git history).

Why not the treelet wavefront (ops/treelet.py)? Its per-ray geometry
gathers move ``B x visits x 4.6 KB`` of treelet blocks through the ~88 GB/s
gather path (~3 GB per bounce at 262k rays), which caps practice7_2/7_3
at ~5 M path-vertices/s. Here geometry moves once per *block* of 128
pairs that share a treelet (~40 MB per bounce), because pairs are grouped
by treelet id with one sort.

Pipeline per bounce (all static shapes; every stage chained-measured):

1. CULL    -- ONE fused flat pass: slab-test (B, Tp) treelet AABBs and emit
   (a) an i32 KEY matrix packing EXACT entry-distance f32 bits | treelet
   id (the ops/treelet.py packing -- any quantized key collapses on
   bounce rays, whose nearby treelets all have entry ~0),
   (b) hit bits packed into (B, W) uint32 words, (c) per-treelet counts.
2. EXTRACT -- the K *nearest* treelets per ray: K min-reductions over the
   key matrix with a strictly-greater-than-last mask (ordering is what
   makes downstream pruning bite: bit-order extraction left 30-58% of
   bounce rays without a best hit after the main pass, and their
   straggler loops dominated the bounce at 10-20x the main-pass cost).
3. COUNTS  -- pair counts per treelet for this pass = full counts minus
   leftover counts; leftover bits exist only on straggler rays, so the
   leftover count is computed on the COMPACTED straggler set (cheap).
4. FILL    -- ``(-count) % BLOCK`` filler pairs per treelet make every
   treelet's segment a BLOCK multiple: after sorting, EVERY block of
   BLOCK pairs holds exactly one treelet id. No scatters, no leftovers.
5. SORT#1  -- one ``lax.sort`` over (key=tid, rayid, ro.xyz, rd.xyz).
6. TEST    -- per block: ONE geometry row gather of the treelet's packed
   (9 x SLOTS) triangle planes, dense Moller-Trumbore over
   (blocks, BLOCK, SLOTS), per-pair min + argmin.
7. SORT#2  -- ``lax.sort`` by rayid: every real ray emitted exactly K pair
   rows (sentinels included) and fillers carry rayid=B, so the first K*B
   sorted rows reshape EXACTLY to (B, K) -> per-ray min.
8. STRAGGLERS -- rays with more than K hit treelets keep leftover mask
   bits: one full-B exact-entry prune against the main pass's best kills
   most of them, the rest are finished nearest-first with best-bound
   pruning (src/bvh.rs:258-262) in two compaction tiers (a wide chunk
   with a round budget, then an 8x narrower chunk to completion -- the
   straggler depth distribution is wide-but-shallow and a single
   while_loop prices MAX rounds at full width). Nothing is dropped at
   the caps; the outer loop re-compacts until every bit is resolved.

The result equals an exhaustive nearest-hit: every hit treelet is either
dense-tested with the same ``ray_triangle`` kernel as the dense backend or
pruned by a strictly-closer best hit, so treelet/dense agreement tests
carry over unchanged. Works on both treelet partitions (ops/bvh.py): the
SAH subtree cut (default) and disjoint kd cells (RT_PARTITION=kd).

STATUS (measured on practice7_3, 262k lanes, v5e): wins isolated-bounce
A/Bs against the treelet wavefront on coherent rays (29 ms vs 40 ms) and
loses on incoherent bounce rays (111 ms vs 59 ms: the straggler tail);
END-TO-END it loses badly (~0.8 vs ~5 M path-vertices/s) because its
sort+cull costs are FIXED per call while the wavefront's rounds collapse
as lanes die across the depth scan (~20-25% mean occupancy). Opt-in via
RT_TRAVERSE=grouped until the render loop regenerates dead lanes
(persistent ray queues); see TODO.md for the full analysis.
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

BLOCK = 128  # pairs per single-treelet block (= one geometry fetch)
# treelet visits handled by the grouped main pass per ray. Leftover visits
# go to the (expensive, compacted) straggler finish; on incoherent bounce
# rays mean visits are 5-8, so with the MXU block test making over-testing
# cheap a LARGER K that starves the straggler path wins -- RT_K tunes it
# (read at trace time; one compile per setting).
K_MAIN = 3


def _k_main() -> int:
    import os

    return int(os.environ.get("RT_K", str(K_MAIN)))
STRAGGLER_DIV = 8  # straggler compaction cap = B // STRAGGLER_DIV
KEY_MISS = jnp.int32(2**31 - 1)


class GroupedArrays(NamedTuple):
    """Per-scene constants for the grouped traversal (built in ops.bvh).

    SLOTS (triangle slots per treelet) is derived from shapes
    (``geom_rows.shape[1] // 9``) so the tuple stays a pure array pytree."""

    aabb: "jnp.ndarray"  # (6, Tp) f32 [minx,miny,minz,maxx,maxy,maxz];
    # padding treelets carry an inverted box (min > max): never hit.
    geom_rows: "jnp.ndarray"  # (Tp, 9 * SLOTS) f32: per-treelet packed
    # triangle planes [p0x|p0y|p0z|p1x|...|p2z], each (SLOTS,); ONE row
    # gather per block. Tp = 32 * W (padding rows are zero => never hit).
    geom_w: "jnp.ndarray" = None  # (Tp*16, 4*SLOTS) f32 centroid-local MT
    # coefficient tiles (ops/mt_pack.py) for the Pallas MXU block test;
    # cols component-major [det | udet | vdet | tdet], each (SLOTS,).
    cen: "jnp.ndarray" = None  # (Tp, 128) f32, treelet centroid in cols 0-2


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
    aabb = np.zeros((6, tp), np.float32)
    aabb[:3, :] = 1.0  # min > max on padding: slab test can never pass
    aabb[3:, :] = -1.0
    aabb[:, :t] = np.asarray(tl_aabb, np.float32)
    geom = np.zeros((tp, 9 * slots), np.float32)
    geom[:t] = np.asarray(blocks, np.float32).transpose(1, 0, 2).reshape(t, 9 * slots)

    # MXU tiles: per-treelet (16, 4*SLOTS) MT coefficients in the treelet's
    # AABB-center frame (precision: mt_pack.py docstring). Fill slots are
    # zero triangles -> efter centroid shift all three verts coincide ->
    # det == 0 -> never valid.
    c = (np.asarray(tl_aabb[:3], np.float64) + np.asarray(tl_aabb[3:], np.float64)) * 0.5  # (3, T)
    bl = np.asarray(blocks, np.float64)  # (9, T, S)
    verts = []
    for k in range(3):
        v = bl[3 * k : 3 * k + 3] - c[:, :, None]  # (3, T, S) local
        verts.append(np.moveaxis(v, 0, -1).reshape(t * slots, 3))
    w = mt_w_matrices(*verts)  # (T*S, 16, 4) f32
    w = w.reshape(t, slots, 16, 4).transpose(0, 2, 3, 1).reshape(t * 16, 4 * slots)
    geom_w = np.zeros((tp * 16, 4 * slots), np.float32)
    geom_w[: t * 16] = w
    cen = np.zeros((tp, 128), np.float32)
    cen[:t, 0:3] = c.T
    return GroupedArrays(
        aabb=np.ascontiguousarray(aabb), geom_rows=geom, geom_w=geom_w, cen=cen
    )


def _tid_bits(tp: int) -> int:
    return max(int(np.ceil(np.log2(max(tp, 2)))), 1)


def _key_of(t, bits: int):
    """ops/treelet.py key packing: positive-f32 entry bits are order-
    preserving as int; the low ``bits`` make room for the treelet id.
    EXACT keys matter: bounce rays start ON surfaces, so every nearby
    treelet has entry ~0 -- any quantized-distance key collapses them into
    one bucket and "nearest-K" degenerates to index order (measured: the
    straggler population stays 3x larger and the tail costs 8x more)."""
    ib = jax.lax.bitcast_convert_type(jnp.maximum(t, 0.0), jnp.int32)
    return jax.lax.shift_left(jax.lax.shift_right_logical(ib, bits), bits)


def _bound_of(bt, bits: int):
    """Inflated best-hit key: truncation can only cause extra work, never
    a missed nearer hit (ops/treelet.py's rule, src/bvh.rs:258-262)."""
    tid_mask = jnp.int32((1 << bits) - 1)
    return _key_of(bt * (1.0 + 1.0 / (1 << (23 - bits - 1))), bits) | tid_mask


# ---------------------------------------------------------------------------
# stage 1: one fused flat cull -> u16 keys + (B, W) hit words + counts
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


def _cull_keys(ro: Vec3, rd: Vec3, ga: "GroupedArrays", tmin):
    """(keys (B, Tp) i32 exact entry|tid, words (B, W) u32, counts (Tp,))."""
    b = ro.x.shape[0]
    tp = ga.aabb.shape[1]
    w = tp // 32
    bits = _tid_bits(tp)
    lo, hi = _slab_lo_hi(ro, rd, ga.aabb)
    hit = (lo <= hi) & (hi > tmin)  # (B, Tp)
    tid = jax.lax.broadcasted_iota(jnp.int32, (b, tp), 1)
    keys = jnp.where(hit, _key_of(lo, bits) | tid, KEY_MISS)
    hitb = hit.reshape(b, w, 32).astype(jnp.uint32)
    shifts = (jnp.uint32(1) << jnp.arange(32, dtype=jnp.uint32))[None, None, :]
    words = jnp.sum(hitb * shifts, axis=2, dtype=jnp.uint32)  # (B, W)
    counts = jnp.sum(hit, axis=0, dtype=jnp.int32)  # (Tp,)
    return keys, words, counts


def _next_key(keys, last):
    """Per-ray minimum key strictly greater than ``last`` (one fused pass)."""
    return jnp.min(
        jnp.where(keys > last[:, None], keys, KEY_MISS), axis=1
    )


def _clear_bit(words, tid):
    """Clear treelet bit ``tid`` per ray in the (B, W) words (one-hot)."""
    w = words.shape[1]
    lane = jax.lax.broadcasted_iota(jnp.int32, words.shape, 1)
    bit = jnp.uint32(1) << (tid & 31)[:, None].astype(jnp.uint32)
    return jnp.where(
        (lane == (tid >> 5)[:, None]) & (tid >= 0)[:, None], words ^ bit, words
    )


def _count_rows(m, tp):
    """Per-treelet popcount over rays: (Tp,) i32 from (B, W) words."""
    cols = []
    for j in range(32):
        cols.append(jnp.sum((m >> jnp.uint32(j)) & 1, axis=0, dtype=jnp.int32))
    return jnp.stack(cols, axis=1).reshape(tp)  # (W,32) -> (Tp,)


# ---------------------------------------------------------------------------
# stage 6: dense single-treelet block test
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


# ---------------------------------------------------------------------------
# stage 8: straggler finish -- nearest-first pruned rounds on the compacted
# leftover set, seeded with the main pass's best hit
# ---------------------------------------------------------------------------


def _straggler_finish(
    words, ro, rd, best_t, best_idx, ga: "GroupedArrays", tmin
):
    """Finish rays whose leftover mask bits survived the main pass.

    Nearest-first rounds over exact int32 entry keys recomputed on the
    compacted set; an inflated best bound stops each ray after the few
    treelets that genuinely enter before its best hit (src/bvh.rs:258-262).
    Two compaction tiers bound the width x max-rounds product (module doc)."""
    b = ro.x.shape[0]
    w = words.shape[1]
    tp = ga.aabb.shape[1]
    bits = _tid_bits(tp)
    tid_mask = jnp.int32((1 << bits) - 1)
    slots = ga.geom_rows.shape[1] // 9
    max_key = KEY_MISS
    # TWO TIERS: the straggler distribution is wide-but-shallow (measured
    # practice7_3 bounce rays: 11% of rays keep leftovers, mean 2.2 but
    # p99 = 22 unpruned treelets). A single while_loop prices MAX rounds
    # at full chunk width; instead the wide tier runs a bounded number of
    # rounds and hands the deep tail to a 8x narrower chunk.
    cap_wide = min(max(b // STRAGGLER_DIV, 256), b)
    cap_narrow = min(max(b // (8 * STRAGGLER_DIV), 256), b)

    def make_chunk(cap, max_rounds):
        def chunk(state):
            m, best_t, best_idx = state
            leftover = jnp.any(m != 0, axis=1)
            idx = jnp.nonzero(leftover, size=cap, fill_value=b)[0]
            safe = jnp.minimum(idx, b - 1)
            live = idx < b
            sub_m = jnp.where(
                live[:, None], jnp.take(m, safe, axis=0), jnp.uint32(0)
            )
            s_ro = Vec3(ro.x[safe], ro.y[safe], ro.z[safe])
            s_rd = Vec3(rd.x[safe], rd.y[safe], rd.z[safe])
            s_bt = jnp.where(live, best_t[safe], INF)
            s_bi = best_idx[safe]

            # exact keys for the leftover bits only (one compact slab pass)
            lo, _ = _slab_lo_hi(s_ro, s_rd, ga.aabb)
            bit_on = (
                (sub_m.reshape(cap, w, 1) >> jnp.arange(32, dtype=jnp.uint32))
                & 1
            ).reshape(cap, tp) == 1
            tid_iota = jax.lax.broadcasted_iota(jnp.int32, (cap, tp), 1)
            sub_keys = jnp.where(bit_on, _key_of(lo, bits) | tid_iota, max_key)

            def next_key(last):
                return jnp.min(
                    jnp.where(sub_keys > last[:, None], sub_keys, max_key),
                    axis=1,
                )

            def cond(carry):
                r, nxt, _, bt, _ = carry
                return (r < max_rounds) & jnp.any(
                    (nxt < max_key) & (nxt <= _bound_of(bt, bits))
                )

            def body(carry):
                r, nxt, sm, bt, bi = carry
                active = (nxt < max_key) & (nxt <= _bound_of(bt, bits))
                tid_c = jnp.where(active, nxt & tid_mask, 0)
                sm = _clear_bit(sm, jnp.where(active, tid_c, -1))
                g = jnp.take(ga.geom_rows, jnp.clip(tid_c, 0, tp - 1), axis=0)
                g = g.reshape(cap, 9, slots)

                def pl(i):
                    return g[:, i, :]

                a = Vec3(pl(0), pl(1), pl(2))
                b_ = Vec3(pl(3), pl(4), pl(5))
                c = Vec3(pl(6), pl(7), pl(8))
                ro_b = Vec3(s_ro.x[:, None], s_ro.y[:, None], s_ro.z[:, None])
                rd_b = Vec3(s_rd.x[:, None], s_rd.y[:, None], s_rd.z[:, None])
                t, _, _, valid = ray_triangle(ro_b, rd_b, a, b_, c)
                t = jnp.where(valid & (t > tmin), t, INF)
                slot = jnp.argmin(t, axis=1).astype(jnp.int32)
                t_hit = jnp.min(t, axis=1)
                better = active & (t_hit < bt)
                bi = jnp.where(better, tid_c * slots + slot, bi)
                bt = jnp.where(better, t_hit, bt)
                nxt = jnp.where(active, next_key(nxt), max_key)
                return r + 1, nxt, sm, bt, bi

            init = (
                jnp.int32(0),
                next_key(jnp.full((cap,), -1, jnp.int32)),
                sub_m,
                s_bt,
                s_bi,
            )
            _, nxt, sub_m, s_t, s_i = jax.lax.while_loop(cond, body, init)
            # rays cut off by the round budget keep their remaining bits
            # (re-compacted into the narrow tier); finished rays drop them
            alive = (nxt < max_key) & (nxt <= _bound_of(s_t, bits))
            sub_m = jnp.where(
                alive[:, None] & live[:, None], sub_m, jnp.uint32(0)
            )
            best_t = best_t.at[idx].set(s_t, mode="drop")
            best_idx = best_idx.at[idx].set(s_i, mode="drop")
            m = m.at[idx].set(sub_m, mode="drop")
            return m, best_t, best_idx

        return chunk

    chunk_wide = make_chunk(cap_wide, 6)
    chunk_narrow = make_chunk(cap_narrow, 1 << 30)

    def any_left(state):
        m, _, _ = state
        return jnp.any(m != 0)

    def step(state):
        m, _, _ = state
        n = jnp.sum(jnp.any(m != 0, axis=1))
        return jax.lax.cond(n > cap_narrow, chunk_wide, chunk_narrow, state)

    _, best_t, best_idx = jax.lax.while_loop(
        any_left, step, (words, best_t, best_idx)
    )
    return best_t, best_idx


# ---------------------------------------------------------------------------
# the traversal
# ---------------------------------------------------------------------------


def nearest_hit_grouped(
    ro: Vec3, rd: Vec3, scn: SceneArrays, statics: SceneStatics, tmin=0.0
) -> SceneHit:
    """Nearest hit over the treelet-partitioned triangle table (module doc)."""
    b_in = ro.x.shape[0]
    lane_mult = BLOCK // np.gcd(_k_main(), BLOCK)
    pad = (-b_in) % lane_mult  # K*B must be a BLOCK multiple
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
    bits = _tid_bits(tp)
    tid_mask = jnp.int32((1 << bits) - 1)
    b = b_in
    k = _k_main()
    sentinel_key = jnp.int32(tp + 1)  # sort-#1 key after every real tid

    # 1. cull
    keys, words, full_counts = _cull_keys(ro, rd, ga, tmin)

    # 2. extract the K nearest treelets per ray (quantized entry order)
    m = words
    tids = []
    last = jnp.full((b,), -1, jnp.int32)
    for _ in range(k):
        last = _next_key(keys, last)
        tid = jnp.where(last < KEY_MISS, last & tid_mask, -1)
        m = _clear_bit(m, tid)
        tids.append(tid)
    tid_kb = jnp.stack(tids)  # (K, B); -1 where exhausted

    # 3. counts of extracted pairs = full - leftover (leftover counted on
    # the compacted straggler set; zero stragglers is the common case)
    n_strag = jnp.sum(jnp.any(m != 0, axis=1))

    def left_counts(m):
        cap = min(max(b // STRAGGLER_DIV, 256), b)
        idx = jnp.nonzero(jnp.any(m != 0, axis=1), size=cap, fill_value=b)[0]
        live = idx < b
        sub = jnp.where(
            live[:, None], jnp.take(m, jnp.minimum(idx, b - 1), axis=0), jnp.uint32(0)
        )
        full = _count_rows(sub, tp)

        def overflow():
            # cap overflow: count the (rare) un-compacted remainder exactly
            extra = m.at[jnp.minimum(idx, b - 1)].set(
                jnp.zeros_like(sub), mode="drop"
            )
            return _count_rows(extra, tp)

        return full + jax.lax.cond(
            jnp.sum(jnp.any(m != 0, axis=1)) > cap,
            overflow,
            lambda: jnp.zeros((tp,), jnp.int32),
        )

    leftover_counts = jax.lax.cond(
        n_strag == 0,
        lambda m: jnp.zeros((tp,), jnp.int32),
        left_counts,
        m,
    )
    counts = full_counts - leftover_counts

    # 4. fillers: pad every treelet's pair segment to a BLOCK multiple
    fill_n = (-counts) % BLOCK  # (Tp,)
    filler_key = jnp.where(
        jnp.arange(BLOCK, dtype=jnp.int32)[None, :] < fill_n[:, None],
        jnp.arange(tp, dtype=jnp.int32)[:, None],
        sentinel_key,
    ).reshape(-1)  # (Tp * BLOCK,)

    # 5. sort #1: group pairs by treelet id
    rayid = jnp.broadcast_to(jnp.arange(b, dtype=jnp.int32)[None, :], (k, b))
    key = jnp.where(tid_kb >= 0, tid_kb, sentinel_key).reshape(-1)
    key = jnp.concatenate([key, filler_key])
    nfill = tp * BLOCK
    ray_col = jnp.concatenate(
        [rayid.reshape(-1), jnp.full((nfill,), b, jnp.int32)]
    )

    def bfill(c):
        return jnp.concatenate(
            [
                jnp.broadcast_to(c[None, :], (k, b)).reshape(-1),
                jnp.zeros((nfill,), c.dtype),
            ]
        )

    sorted_cols = jax.lax.sort(
        (key, ray_col) + tuple(bfill(c) for c in (ro.x, ro.y, ro.z, rd.x, rd.y, rd.z)),
        num_keys=1,
    )
    s_key, s_ray = sorted_cols[0], sorted_cols[1]
    s_comps = sorted_cols[2:]

    # 6. block test (every block holds one treelet id by construction):
    # Pallas MXU kernel on real TPU (scalar-prefetch geometry DMA + one
    # dot_general per block -- ops/pallas_grouped.py), XLA VPU sweep
    # otherwise
    import os as _os2

    nb = s_key.shape[0] // BLOCK
    block_tid = s_key.reshape(nb, BLOCK)[:, 0]
    prx = [c.reshape(nb, BLOCK) for c in s_comps]
    use_pallas_test = (
        jax.default_backend() == "tpu"
        and not _os2.environ.get("RT_NO_PALLAS")
        and ga.geom_w is not None
        and isinstance(tmin, (int, float))
    )
    if use_pallas_test:
        from .pallas_grouped import block_mt_pallas

        t_pair, slot_pair = block_mt_pallas(
            block_tid, tuple(prx), ga.geom_w, ga.cen, slots, tp, float(tmin),
            precision=_os2.environ.get("RT_MT_PRECISION", "highest"),
        )
    else:
        t_pair, slot_pair = _block_mt(ga.geom_rows, block_tid, prx, slots, tmin)
    real = (block_tid < tp)[:, None] & (s_ray.reshape(nb, BLOCK) < b)
    t_pair = jnp.where(real, t_pair, INF)
    idx_pair = jnp.clip(block_tid, 0, tp - 1)[:, None] * slots + slot_pair

    # 7. sort #2: back to ray-major; each real ray contributed exactly K rows
    _, r_t, r_idx = jax.lax.sort(
        (s_ray, t_pair.reshape(-1), idx_pair.reshape(-1)), num_keys=1
    )
    t_bk = r_t[: k * b].reshape(b, k)
    i_bk = r_idx[: k * b].reshape(b, k)
    best_t = t_bk[:, 0]
    best_idx = i_bk[:, 0]
    for j in range(1, k):  # static where-chain; no per-lane gather
        better = t_bk[:, j] < best_t
        best_idx = jnp.where(better, i_bk[:, j], best_idx)
        best_t = jnp.where(better, t_bk[:, j], best_t)

    # 8. stragglers: one full-B exact-entry prune first -- the main pass
    # tested the K nearest treelets, so best_t kills almost every leftover
    # bit (quantized key buckets are too coarse to do this) -- then the
    # compacted finish handles what survives
    def prune_and_finish(args):
        m, bt, bi = args
        lo, _ = _slab_lo_hi(ro, rd, ga.aabb)
        keep = jnp.maximum(lo, 0.0) <= bt[:, None]
        keep_w = jnp.sum(
            keep.reshape(b, tp // 32, 32).astype(jnp.uint32)
            * (jnp.uint32(1) << jnp.arange(32, dtype=jnp.uint32))[None, None, :],
            axis=2,
            dtype=jnp.uint32,
        )
        return _straggler_finish(m & keep_w, ro, rd, bt, bi, ga, tmin)

    best_t, best_idx = jax.lax.cond(
        n_strag == 0,
        lambda args: (args[1], args[2]),
        prune_and_finish,
        (m, best_t, best_idx),
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
