"""Device BVH traversal: batched stack walk in a single ``lax.while_loop``.

The reference's recursive nearest-hit walk (src/bvh.rs:231-297) becomes a
data-parallel iteration: each ray in the (B,)-lane batch carries its own
explicit stack (B, STACK_DEPTH) i32 and a running best (t, prim). One
while-loop iteration pops one node per ray and either

* tests the node's two child AABBs and pushes the surviving children
  near-first (ordered traversal -- the reference visits left/right in build
  order instead, src/bvh.rs:279-295), or
* dense-tests the leaf's <= LEAF_SIZE contiguous primitives.

Pruning matches the reference (src/bvh.rs:258-262): a subtree is skipped
when its AABB entry distance exceeds the current best hit *and* the ray
origin is outside the box (t_enter > 0).

The loop runs until every ray's stack is empty -- per-batch divergence is
the known cost (SURVEY.md section 7 hard part 1); ray batches are kept
moderate so stragglers bound less work, and leaf tests are fixed-shape so
the compiler emits one fused gather+intersect per iteration.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..scene.types import SceneArrays, SceneStatics
from .bvh import LEAF_SIZE
from .intersect import INF, ray_aabb, ray_triangle
from .scene_intersect import SceneHit, _expand, _fold_in_planes, _prim_ts, _v3
from .vec import Vec3

STACK_DEPTH = 64


def nearest_hit_bvh(
    ro: Vec3, rd: Vec3, scn: SceneArrays, statics: SceneStatics, tmin=0.0
) -> SceneHit:
    bvh = scn.bvh
    b = ro.x.shape[0]
    lane = jnp.arange(b)

    node_min = bvh.node_min  # (M, 3)
    node_max = bvh.node_max
    node_left = bvh.node_left
    node_right = bvh.node_right
    node_is_leaf = bvh.node_is_leaf

    from .gather import take_packed
    from .scene_intersect import prim_ref_from_packed

    def gather_leaf_ts(start, count):
        """(B, LEAF_SIZE) hit ts for the contiguous leaf range, inf-masked.

        One packed gather per leaf test (ops/gather.py); (B, LEAF, 3) row
        gathers are a measured ~10x slowdown."""
        k = jnp.arange(LEAF_SIZE, dtype=jnp.int32)  # (LEAF,)
        pid = start[:, None] + k[None, :]  # (B, LEAF)
        valid = k[None, :] < count[:, None]
        pid = jnp.clip(pid, 0, scn.ptype.shape[0] - 1)
        prim = prim_ref_from_packed(take_packed(scn.packed, pid))
        t = _prim_ts(_expand(ro), _expand(rd), prim, statics, tmin)
        return jnp.where(valid, t, INF), pid

    def cond(carry):
        ptr = carry[0]
        return jnp.any(ptr > 0)

    def body(carry):
        ptr, stack, best_t, best_idx = carry
        active = ptr > 0
        top = jnp.maximum(ptr - 1, 0)
        node = jnp.where(active, stack[lane, top], 0)
        ptr = jnp.where(active, ptr - 1, ptr)

        leaf = node_is_leaf[node] & active
        internal = (~node_is_leaf[node]) & active

        # ---- internal: test both children, push near-first ----
        lc = node_left[node]
        rc = node_right[node]

        def child_hit(c):
            bmin = _v3(node_min[c])
            bmax = _v3(node_max[c])
            iv = ray_aabb(ro, rd, bmin, bmax)
            hit = iv.valid & (iv.t2 > 0.0)
            # reference prune (src/bvh.rs:258-262): skip when entry point is
            # beyond the best hit and the origin is outside the box
            hit &= ~((iv.t1 > best_t) & (iv.t1 > 0.0))
            return hit, iv.t1

        hit_l, t_l = child_hit(lc)
        hit_r, t_r = child_hit(rc)
        hit_l &= internal
        hit_r &= internal

        near_is_l = t_l <= t_r
        both = hit_l & hit_r
        # push order: far first so near pops first
        far = jnp.where(near_is_l, rc, lc)
        near = jnp.where(near_is_l, lc, rc)
        first = jnp.where(both, far, jnp.where(hit_l, lc, rc))
        push1 = hit_l | hit_r
        stack = stack.at[lane, jnp.where(push1, ptr, STACK_DEPTH - 1)].set(
            jnp.where(push1, first, stack[lane, STACK_DEPTH - 1])
        )
        ptr = ptr + push1.astype(jnp.int32)
        stack = stack.at[lane, jnp.where(both, ptr, STACK_DEPTH - 1)].set(
            jnp.where(both, near, stack[lane, STACK_DEPTH - 1])
        )
        ptr = ptr + both.astype(jnp.int32)

        # ---- leaf: dense test of <= LEAF_SIZE contiguous prims ----
        start = jnp.where(leaf, node_left[node], 0)
        count = jnp.where(leaf, node_right[node], 0)
        t_leaf, pid = gather_leaf_ts(start, count)  # (B, LEAF)
        kbest = jnp.argmin(t_leaf, axis=1)
        t_best_leaf = jnp.min(t_leaf, axis=1)
        pid_best = pid[lane, kbest]
        improve = leaf & (t_best_leaf < best_t)
        best_idx = jnp.where(improve, pid_best, best_idx)
        best_t = jnp.where(improve, t_best_leaf, best_t)

        return ptr, stack, best_t, best_idx

    stack0 = jnp.zeros((b, STACK_DEPTH), jnp.int32)  # root = node 0
    ptr0 = jnp.ones((b,), jnp.int32)
    init = (ptr0, stack0, jnp.full((b,), INF), jnp.zeros((b,), jnp.int32))
    _, _, best_t, best_idx = jax.lax.while_loop(cond, body, init)

    hit = SceneHit(
        best_t, best_idx, jnp.zeros_like(best_idx, bool), jnp.isfinite(best_t)
    )
    if statics.num_planes > 0:
        hit = _fold_in_planes(ro, rd, scn, hit, tmin)
    return hit
