"""Pallas MXU block-test kernel (ops/pallas_grouped.py) vs the XLA sweep.

Runs the kernel in interpret mode on CPU against ``_block_mt`` on a
fabricated treelet set (random triangles + zero fill slots + a sentinel
block); the real-TPU compiled path is covered by the grouped agreement
tests when RT_TRAVERSE=grouped runs on hardware.
"""

import jax.numpy as jnp
import numpy as np

from raytracing_course_2024_tpu.ops.grouped import _block_mt, build_grouped
from raytracing_course_2024_tpu.ops.pallas_grouped import BLOCK, block_mt_pallas


def _fabricate(rng, t=3, slots=32):
    """(aabb (6,t), blocks (9,t,slots)) with some zero fill slots."""
    blocks = np.zeros((9, t, slots), np.float64)
    for ti in range(t):
        c = rng.uniform(-5, 5, 3)
        n_real = slots - rng.integers(0, slots // 2)
        for m in range(n_real):
            v = c + rng.uniform(-0.8, 0.8, (3, 3))
            blocks[:, ti, m] = v.reshape(9)
    p = blocks.reshape(3, 3, t, slots)
    mask = (blocks != 0).any(axis=0)  # (t, slots)
    big = 1e30
    lo = np.where(mask[None, :, :], p.min(axis=1), big).min(axis=2) - 1e-4
    hi = np.where(mask[None, :, :], p.max(axis=1), -big).max(axis=2) + 1e-4
    aabb = np.concatenate([lo, hi])  # (6, t)
    return aabb, blocks.astype(np.float32)


def test_block_mt_pallas_matches_xla():
    rng = np.random.default_rng(7)
    t, slots = 3, 32
    aabb, blocks = _fabricate(rng, t, slots)
    ga = build_grouped(aabb, blocks)
    tp = ga.aabb.shape[1]

    nb = 6
    block_tid = np.array([0, 1, 2, 0, 1, tp + 1], np.int32)  # last = sentinel
    o = rng.uniform(-8, 8, (nb, BLOCK, 3))
    d = rng.normal(size=(nb, BLOCK, 3))
    d /= np.linalg.norm(d, axis=2, keepdims=True)
    prx = [jnp.asarray(o[..., i], jnp.float32) for i in range(3)] + [
        jnp.asarray(d[..., i], jnp.float32) for i in range(3)
    ]

    t_ref, slot_ref = _block_mt(
        jnp.asarray(ga.geom_rows), jnp.asarray(block_tid), prx, slots, 0.0
    )
    t_ref = np.asarray(jnp.where(jnp.asarray(block_tid)[:, None] < tp, t_ref, jnp.inf))
    slot_ref = np.asarray(slot_ref)

    t_pl, slot_pl = block_mt_pallas(
        jnp.asarray(block_tid), tuple(prx), jnp.asarray(ga.geom_w),
        slots, tp, 0.0, interpret=True,
    )
    t_pl = np.asarray(t_pl)
    slot_pl = np.asarray(slot_pl)

    hit_ref = np.isfinite(t_ref)
    hit_pl = np.isfinite(t_pl)
    assert (hit_ref != hit_pl).mean() < 1e-3  # edge-grazing fp flips only
    both = hit_ref & hit_pl
    assert np.allclose(t_pl[both], t_ref[both], rtol=3e-5, atol=3e-5)
    same = slot_pl[both] == slot_ref[both]
    assert same.mean() > 0.999, same.mean()  # ties may pick either slot
    # sentinel block produced no hits
    assert not np.isfinite(t_pl[-1]).any()


def test_cull_bits_pallas_matches_xla():
    """The fused Pallas cull (ops/pallas_cull.py, interpret mode) is
    bit-identical to ops.grouped._cull_bits: same crossing words, same
    per-treelet counts, including NaN padding treelets and padded rays."""
    import os
    from raytracing_course_2024_tpu.ops.grouped import _cull_bits
    from raytracing_course_2024_tpu.ops.pallas_cull import cull_bits_pallas
    from raytracing_course_2024_tpu.ops.vec import Vec3

    rng = np.random.default_rng(11)
    t, slots = 70, 32  # Tp pads to 96 (32-mult), Tpp to 128
    aabb, blocks = _fabricate(rng, t, slots)
    ga = build_grouped(aabb, blocks)
    assert ga.aabb_t is not None and ga.aabb_t.shape[0] % 128 == 0

    b = 700  # not a multiple of the kernel tile -> exercises ray padding
    o = rng.uniform(-8, 8, (b, 3)).astype(np.float32)
    d = rng.normal(size=(b, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    ro = Vec3(*(jnp.asarray(o[:, i]) for i in range(3)))
    rd = Vec3(*(jnp.asarray(d[:, i]) for i in range(3)))

    ga_j = type(ga)(*(jnp.asarray(f) if f is not None else None for f in ga))
    os.environ["RT_NO_PALLAS"] = "1"  # force the XLA reference path
    try:
        w_ref, c_ref = _cull_bits(ro, rd, ga_j, 0.25)
    finally:
        del os.environ["RT_NO_PALLAS"]
    w_pl, c_pl = cull_bits_pallas(ro, rd, ga_j, 0.25, interpret=True)
    assert np.array_equal(np.asarray(w_ref), np.asarray(w_pl))
    assert np.array_equal(np.asarray(c_ref), np.asarray(c_pl))


def test_cull_pop_pallas_matches_xla():
    """The fused cull+pop kernel (cull_pop_pallas, interpret mode) is
    bit-identical to _cull_bits followed by _pop_k: same popped tids in
    the same (ascending-bit) order, same residual words, same full
    per-treelet counts -- including NaN padding treelets, padded rays,
    and rays with fewer than k1 crossings (tid -1 tail)."""
    import os
    from raytracing_course_2024_tpu.ops.grouped import _cull_bits, _pop_k
    from raytracing_course_2024_tpu.ops.pallas_cull import cull_pop_pallas
    from raytracing_course_2024_tpu.ops.vec import Vec3

    rng = np.random.default_rng(17)
    t, slots = 70, 32  # Tp pads to 96 (32-mult), Tpp to 128
    aabb, blocks = _fabricate(rng, t, slots)
    ga = build_grouped(aabb, blocks)

    b = 700  # not a multiple of the kernel tile -> exercises ray padding
    o = rng.uniform(-8, 8, (b, 3)).astype(np.float32)
    d = rng.normal(size=(b, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    ro = Vec3(*(jnp.asarray(o[:, i]) for i in range(3)))
    rd = Vec3(*(jnp.asarray(d[:, i]) for i in range(3)))

    ga_j = type(ga)(*(jnp.asarray(f) if f is not None else None for f in ga))
    k1 = 4
    os.environ["RT_NO_PALLAS"] = "1"  # force the XLA reference path
    try:
        w_ref, c_ref = _cull_bits(ro, rd, ga_j, 0.25)
        tid_ref, m_ref = _pop_k(w_ref, k1)
    finally:
        del os.environ["RT_NO_PALLAS"]
    tid_pl, m_pl, c_pl = cull_pop_pallas(ro, rd, ga_j, 0.25, k1,
                                         interpret=True)
    assert np.array_equal(np.asarray(tid_ref), np.asarray(tid_pl))
    assert np.array_equal(np.asarray(m_ref), np.asarray(m_pl))
    assert np.array_equal(np.asarray(c_ref), np.asarray(c_pl))
    # sanity: some rays actually popped bits and some carry a -1 tail
    tids = np.asarray(tid_pl)
    assert (tids >= 0).any() and (tids == -1).any()


def test_cull_pop_pallas_multichunk():
    """Same bit-equality with Tpp > TC (exercises the in-kernel treelet
    chunk loop and the half-grouped selection-matrix row offsets)."""
    import os
    from raytracing_course_2024_tpu.ops.grouped import _cull_bits, _pop_k
    from raytracing_course_2024_tpu.ops.pallas_cull import TC, cull_pop_pallas
    from raytracing_course_2024_tpu.ops.vec import Vec3

    rng = np.random.default_rng(19)
    t, slots = 600, 4  # Tp pads to 608, Tpp to 640 > TC=512 -> two chunks
    aabb, blocks = _fabricate(rng, t, slots)
    ga = build_grouped(aabb, blocks)
    assert ga.aabb_t.shape[0] > TC

    b = 512
    o = rng.uniform(-8, 8, (b, 3)).astype(np.float32)
    d = rng.normal(size=(b, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    ro = Vec3(*(jnp.asarray(o[:, i]) for i in range(3)))
    rd = Vec3(*(jnp.asarray(d[:, i]) for i in range(3)))

    ga_j = type(ga)(*(jnp.asarray(f) if f is not None else None for f in ga))
    k1 = 3  # odd pop count: exercises the sublane-padded tid output
    os.environ["RT_NO_PALLAS"] = "1"
    try:
        w_ref, c_ref = _cull_bits(ro, rd, ga_j, 0.0)
        tid_ref, m_ref = _pop_k(w_ref, k1)
    finally:
        del os.environ["RT_NO_PALLAS"]
    tid_pl, m_pl, c_pl = cull_pop_pallas(ro, rd, ga_j, 0.0, k1,
                                         interpret=True)
    assert np.array_equal(np.asarray(tid_ref), np.asarray(tid_pl))
    assert np.array_equal(np.asarray(m_ref), np.asarray(m_pl))
    assert np.array_equal(np.asarray(c_ref), np.asarray(c_pl))


def test_block_mt_pallas_split_modes():
    """Manual bf16 hi/lo split modes (split3/split4) stay within their
    analytic error bounds of the f32 XLA sweep (interpret mode emulates
    them faithfully: the bf16 casts are real rounding, and DEFAULT dots of
    bf16 inputs are exact-product + f32 accumulation on TPU too)."""
    rng = np.random.default_rng(13)
    t, slots = 3, 32
    aabb, blocks = _fabricate(rng, t, slots)
    ga = build_grouped(aabb, blocks)
    tp = ga.aabb.shape[1]

    nb = 6
    block_tid = np.array([0, 1, 2, 0, 1, 2], np.int32)
    o = rng.uniform(-8, 8, (nb, BLOCK, 3))
    d = rng.normal(size=(nb, BLOCK, 3))
    d /= np.linalg.norm(d, axis=2, keepdims=True)
    prx = [jnp.asarray(o[..., i], jnp.float32) for i in range(3)] + [
        jnp.asarray(d[..., i], jnp.float32) for i in range(3)
    ]
    t_ref, _ = _block_mt(
        jnp.asarray(ga.geom_rows), jnp.asarray(block_tid), prx, slots, 0.0
    )
    t_ref = np.asarray(t_ref)

    for mode, rtol in (("split4", 2e-5), ("split3", 2e-4)):
        t_pl, _ = block_mt_pallas(
            jnp.asarray(block_tid), tuple(prx), jnp.asarray(ga.geom_w),
            slots, tp, 0.0, interpret=True, precision=mode,
        )
        t_pl = np.asarray(t_pl)
        both = np.isfinite(t_ref) & np.isfinite(t_pl)
        # valid-hit sets may differ only on knife-edge predicates
        flip = np.isfinite(t_ref) != np.isfinite(t_pl)
        assert flip.mean() < 5e-3, (mode, flip.mean())
        assert np.allclose(t_pl[both], t_ref[both], rtol=rtol, atol=1e-5), (
            mode,
            np.abs(t_pl[both] - t_ref[both]).max(),
        )
