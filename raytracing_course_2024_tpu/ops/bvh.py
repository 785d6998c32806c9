"""Host-side BVH construction (vectorized numpy binned SAH) -> flat device arrays.

The reference builds a binary SAH BVH with a full-sweep over all 3 axes,
re-sorting the primitive slice per axis with a comparator that *recomputes
AABBs on every comparison* (src/bvh.rs:87-144) -- O(n log^2 n) with a huge
constant. SURVEY.md section 7 explicitly says not to copy that. Here:

* AABBs and centroids are precomputed once, vectorized (the reference's
  rotate-8-corners object AABB, src/aabb.rs:75-94, done for all prims at
  once);
* top-down build with 16-bin SAH per axis (classic binned SAH), leaf when
  n <= LEAF_SIZE or when the best split is no cheaper than the trivial
  leaf cost area*n (the reference's same leaf criterion, src/bvh.rs:88,127);
* output is a flat array pile (SceneArrays.bvh: BvhArrays) with leaves
  padded to exactly LEAF_SIZE primitive slots so the device traversal's
  leaf test is a fixed-shape dense intersection;
* the primitive table is reordered so leaf ranges are contiguous, and the
  light index list is remapped (the reference instead *owns* a reordered
  copy per tree, src/bvh.rs:20-24).

An optional C++ builder (native/bvh_builder.cpp, loaded via ctypes) provides
the same construction ~10x faster for the 100k+ triangle scenes; the numpy
path is the always-available fallback and the correctness oracle.
"""

from __future__ import annotations

import logging
from typing import NamedTuple

import numpy as np

from ..scene.types import TRI, SceneArrays, SceneStatics

log = logging.getLogger("rt_tpu")

LEAF_SIZE = 4
NUM_BINS = 16
AABB_EPS = 1e-4  # pad, reference src/aabb.rs:53-65 pads by EPS


def _rot_mat(q: np.ndarray) -> np.ndarray:
    """(M,4) xyzw quaternions -> (M,3,3) rotation matrices."""
    x, y, z, w = q[:, 0], q[:, 1], q[:, 2], q[:, 3]
    return np.stack(
        [
            np.stack([1 - 2 * (y * y + z * z), 2 * (x * y - z * w), 2 * (x * z + y * w)], -1),
            np.stack([2 * (x * y + z * w), 1 - 2 * (x * x + z * z), 2 * (y * z - x * w)], -1),
            np.stack([2 * (x * z - y * w), 2 * (y * z + x * w), 1 - 2 * (x * x + y * y)], -1),
        ],
        axis=1,
    )


def primitive_aabbs(scn: SceneArrays) -> tuple:
    """(aabb_min (N,3), aabb_max (N,3)) for the finite table, world space.

    Triangles: vertex min/max (verts are pre-baked world space).
    Box/ellipsoid: local AABB = +-s, rotated via all 8 corners + position
    (reference src/aabb.rs:75-94)."""
    p0 = np.asarray(scn.p0, np.float64)
    p1 = np.asarray(scn.p1, np.float64)
    p2 = np.asarray(scn.p2, np.float64)
    ptype = np.asarray(scn.ptype)
    n = p0.shape[0]

    amin = np.minimum(np.minimum(p0, p1), p2)
    amax = np.maximum(np.maximum(p0, p1), p2)

    nontri = ptype != TRI
    if nontri.any():
        s = p0[nontri]  # half extents / radii
        q = np.asarray(scn.rotation, np.float64)[nontri]
        pos = np.asarray(scn.position, np.float64)[nontri]
        rot = _rot_mat(q)  # (M,3,3)
        # 8 corners of [-s, s]
        signs = np.array(
            [[sx, sy, sz] for sx in (-1, 1) for sy in (-1, 1) for sz in (-1, 1)],
            np.float64,
        )  # (8,3)
        corners = signs[None, :, :] * s[:, None, :]  # (M,8,3)
        world = np.einsum("mij,mkj->mki", rot, corners) + pos[:, None, :]
        amin[nontri] = world.min(axis=1)
        amax[nontri] = world.max(axis=1)

    return amin - AABB_EPS, amax + AABB_EPS


class _HostBvh(NamedTuple):
    node_min: np.ndarray
    node_max: np.ndarray
    node_left: np.ndarray
    node_right: np.ndarray
    node_is_leaf: np.ndarray
    prim_order: np.ndarray


def build_bvh(amin: np.ndarray, amax: np.ndarray) -> _HostBvh:
    """Binned-SAH binary BVH over the given AABBs. Root is node 0."""
    n = amin.shape[0]
    centroid = (amin + amax) * 0.5

    order = np.arange(n, dtype=np.int64)
    node_min, node_max = [], []
    node_left, node_right, node_is_leaf = [], [], []

    # worklist of (start, length, node_id); nodes appended breadth-ish
    def alloc():
        node_min.append(None)
        node_max.append(None)
        node_left.append(0)
        node_right.append(0)
        node_is_leaf.append(False)
        return len(node_min) - 1

    root = alloc()
    stack = [(0, n, root)]
    while stack:
        start, length, nid = stack.pop()
        ids = order[start : start + length]
        bmin = amin[ids].min(axis=0)
        bmax = amax[ids].max(axis=0)
        node_min[nid] = bmin
        node_max[nid] = bmax

        split = _find_split(amin, amax, centroid, ids, bmin, bmax)
        if split is None:
            node_is_leaf[nid] = True
            node_left[nid] = start
            node_right[nid] = length
            continue
        axis, thresh = split
        keys = centroid[ids, axis]
        left_mask = keys < thresh
        nl = int(left_mask.sum())
        if nl == 0 or nl == length:  # degenerate (all centroids equal): median
            perm = np.argsort(keys, kind="stable")
            order[start : start + length] = ids[perm]
            nl = length // 2
        else:
            order[start : start + length] = np.concatenate(
                [ids[left_mask], ids[~left_mask]]
            )
        lid = alloc()
        rid = alloc()
        node_left[nid] = lid
        node_right[nid] = rid
        stack.append((start, nl, lid))
        stack.append((start + nl, length - nl, rid))

    return _HostBvh(
        node_min=np.asarray(node_min, np.float32),
        node_max=np.asarray(node_max, np.float32),
        node_left=np.asarray(node_left, np.int32),
        node_right=np.asarray(node_right, np.int32),
        node_is_leaf=np.asarray(node_is_leaf, bool),
        prim_order=order.astype(np.int32),
    )


def _sah_area(dmin, dmax):
    d = np.maximum(dmax - dmin, 0.0)
    return d[..., 0] * d[..., 1] + d[..., 1] * d[..., 2] + d[..., 2] * d[..., 0]


def _find_split(amin, amax, centroid, ids, bmin, bmax):
    """Best (axis, centroid threshold) by 16-bin SAH, or None for a leaf.

    Leaf criteria mirror the reference (src/bvh.rs:88-90,127-129):
    n <= LEAF_SIZE, or the trivial cost area*n beats the best split."""
    length = len(ids)
    if length <= LEAF_SIZE:
        return None

    best = (np.inf, None, None)
    cmin = centroid[ids]
    lo = cmin.min(axis=0)
    hi = cmin.max(axis=0)
    for axis in range(3):
        if hi[axis] - lo[axis] < 1e-12:
            continue
        scale = NUM_BINS * (1.0 - 1e-7) / (hi[axis] - lo[axis])
        bin_idx = ((cmin[:, axis] - lo[axis]) * scale).astype(np.int64)
        # per-bin counts and bounds
        counts = np.bincount(bin_idx, minlength=NUM_BINS)
        binmin = np.full((NUM_BINS, 3), np.inf)
        binmax = np.full((NUM_BINS, 3), -np.inf)
        np.minimum.at(binmin, bin_idx, amin[ids])
        np.maximum.at(binmax, bin_idx, amax[ids])
        # prefix/suffix sweeps
        lmin = np.minimum.accumulate(binmin, axis=0)
        lmax = np.maximum.accumulate(binmax, axis=0)
        rmin = np.minimum.accumulate(binmin[::-1], axis=0)[::-1]
        rmax = np.maximum.accumulate(binmax[::-1], axis=0)[::-1]
        lcount = np.cumsum(counts)
        rcount = length - lcount
        # split after bin k (k = 0..NUM_BINS-2)
        cost = lcount[:-1] * _sah_area(lmin[:-1], lmax[:-1]) + rcount[:-1] * _sah_area(
            rmin[1:], rmax[1:]
        )
        k = int(np.argmin(cost))
        if cost[k] < best[0] and 0 < lcount[k] < length:
            thresh = lo[axis] + (k + 1) / scale
            best = (cost[k], axis, thresh)

    trivial = _sah_area(bmin, bmax) * length  # reference src/bvh.rs:127
    if best[1] is None or trivial < best[0]:
        return None
    return best[1], best[2]


def _reorder(a: np.ndarray, order: np.ndarray) -> np.ndarray:
    return np.asarray(a)[order]


def attach_bvh(scn: SceneArrays, statics: SceneStatics,
               max_slots: int | None = None) -> SceneArrays:
    """Build the SAH BVH, cut it into treelets, and reorder+pad the finite
    table into fixed 128-slot treelet blocks (ops/treelet.py explains the
    TPU-first traversal this feeds). Lights are remapped to padded rows.

    Tries the native C++ builder first (same algorithm); falls back to numpy.
    """
    from ..scene.build import build_packs
    from . import treelet as _tl
    from .treelet import TreeletArrays, _geom_cols, pad_to_slots, partition_treelets

    slots = max_slots or _tl.TREELET_SLOTS

    amin, amax = primitive_aabbs(scn)
    n = amin.shape[0]

    bvh = None
    try:
        from ..native import native_build_bvh

        bvh = native_build_bvh(amin, amax, LEAF_SIZE, NUM_BINS)
    except Exception as e:  # noqa: BLE001 -- any native failure -> numpy path
        log.debug("native BVH builder unavailable (%s); using numpy", e)
    if bvh is None:
        bvh = build_bvh(amin, amax)

    order = bvh.prim_order  # old row of the prim in sorted position i
    ranges, tl_min, tl_max = partition_treelets(bvh, n, slots)
    slot_of_sorted, n_pad = pad_to_slots(ranges, n, slots)
    # old row -> padded slot
    slot_of_old = np.empty(n, np.int64)
    slot_of_old[order] = slot_of_sorted

    def place(a, fill=0.0):
        a = np.asarray(a)
        out = np.full((n_pad,) + a.shape[1:], fill, a.dtype)
        out[slot_of_old] = a
        return out

    reordered = scn._replace(
        ptype=place(scn.ptype),  # fill rows: ptype=0 TRI with zero verts
        p0=place(scn.p0),
        p1=place(scn.p1),
        p2=place(scn.p2),
        sn0=place(scn.sn0),
        sn1=place(scn.sn1),
        sn2=place(scn.sn2),
        position=place(scn.position),
        rotation=place(scn.rotation),
        color=place(scn.color),
        metallic=place(scn.metallic),
        roughness=place(scn.roughness, 1.0),
        emission=place(scn.emission),
        ior=place(scn.ior, 1.5),
        mkind=place(scn.mkind),
        light_idx=slot_of_old[np.asarray(scn.light_idx)].astype(np.int32),
        bvh=None,
    )
    reordered = build_packs(reordered)

    cols = _geom_cols(reordered, statics)
    t = len(ranges)
    blocks = np.stack(
        [np.asarray(c, np.float32).reshape(t, slots) for c in cols]
    )  # (Cg, T, SLOTS)
    aabb = np.ascontiguousarray(
        np.concatenate([tl_min.T, tl_max.T]).astype(np.float32)
    )  # (6, T)
    return reordered._replace(bvh=TreeletArrays(aabb=aabb, blocks=blocks))


def validate_bvh(host_bvh: _HostBvh, amin: np.ndarray, amax: np.ndarray) -> None:
    """Containment invariants on the host tree (the reference asserts these
    at the start of every render, src/bvh.rs:299-322 + rendering.rs:22; we
    check once at build/test time instead). amin/amax are in the ORIGINAL
    primitive order; host_bvh.prim_order maps sorted position -> old row."""
    nmin = np.asarray(host_bvh.node_min, np.float64)
    nmax = np.asarray(host_bvh.node_max, np.float64)
    left = np.asarray(host_bvh.node_left)
    right = np.asarray(host_bvh.node_right)
    leaf = np.asarray(host_bvh.node_is_leaf)
    order = np.asarray(host_bvh.prim_order)
    smin = amin[order]  # sorted order
    smax = amax[order]
    tol = 1e-5
    for nid in range(len(left)):
        if leaf[nid]:
            s, c = left[nid], right[nid]
            assert (smin[s : s + c] >= nmin[nid] - tol).all(), nid
            assert (smax[s : s + c] <= nmax[nid] + tol).all(), nid
        else:
            for ch in (left[nid], right[nid]):
                assert (nmin[ch] >= nmin[nid] - tol).all(), (nid, ch)
                assert (nmax[ch] <= nmax[nid] + tol).all(), (nid, ch)
    # the reorder must be a permutation covering every primitive
    assert (np.sort(order) == np.arange(len(order))).all()
    # leaves must tile [0, N) exactly
    covered = np.zeros(len(order), bool)
    for s, c in zip(left[leaf], right[leaf]):
        assert not covered[s : s + c].any()
        covered[s : s + c] = True
    assert covered.all()


def validate_treelets(scn: SceneArrays, statics: SceneStatics) -> None:
    """Treelet invariants on the padded device arrays: every real primitive's
    AABB is contained in its treelet's AABB; fill slots never intersect."""
    tl = scn.bvh
    aabb = np.asarray(tl.aabb, np.float64)  # (6, T)
    amin, amax = primitive_aabbs(scn)
    n_pad = amin.shape[0]
    t = aabb.shape[1]
    assert n_pad % t == 0
    slots = n_pad // t
    # fill rows are zero-vert triangles: detect via degenerate extent
    extent = (amax - amin).max(axis=1)
    real = extent > 3e-4  # fill rows have extent == 2*AABB_EPS
    tol = 1e-4
    for ti in range(t):
        rows = slice(ti * slots, (ti + 1) * slots)
        r = real[rows]
        if not r.any():
            continue
        assert (amin[rows][r] >= aabb[:3, ti] - tol).all(), ti
        assert (amax[rows][r] <= aabb[3:, ti] + tol).all(), ti
    assert int(real.sum()) == statics.num_prims
