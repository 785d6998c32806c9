"""Accelerated nearest-hit for big scenes.

The first implementation here was a classic batched per-ray BVH stack walk
(one node pop per while-loop iteration). On TPU that is gather-bound to
~0.3 Mrays/s -- no per-lane random access exists, so every node visit is a
relayout-heavy XLA gather. It was replaced by the treelet wavefront scheme
(ops/treelet.py): dense treelet-AABB sweep + nearest-first treelet
processing with embedding-style block gathers. This module keeps the stable
entry point used by the integrator.
"""

from __future__ import annotations

from ..scene.types import SceneArrays, SceneStatics
from .treelet import nearest_hit_treelet
from .vec import Vec3


def nearest_hit_bvh(
    ro: Vec3, rd: Vec3, scn: SceneArrays, statics: SceneStatics, tmin=0.0
):
    return nearest_hit_treelet(ro, rd, scn, statics, tmin)
