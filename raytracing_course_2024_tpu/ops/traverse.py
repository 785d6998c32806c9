"""Accelerated nearest-hit backend dispatch for big scenes.

Two device traversals exist for the host-built SAH BVH (ops/bvh.py), both
replacing the reference's recursive per-ray walk (src/bvh.rs:231-297):

* ``ops.treelet`` (DEFAULT) -- nearest-first treelet wavefront with
  per-ray block gathers. Handles every table (incl. boxes/ellipsoids/
  rotations from text scenes).
* ``ops.grouped`` (RT_TRAVERSE=grouped) -- sorted-pair grouped traversal
  for all-triangle scenes: (ray, treelet) pairs grouped by treelet with
  one payload-carrying ``lax.sort`` so geometry moves once per 128-pair
  block (~40 MB/bounce vs the wavefront's ~3 GB).

Why grouped is NOT the default despite winning isolated-bounce A/Bs on
practice7_3 (primary rays 29 ms vs 40 ms at 262k lanes): its sort+cull
costs are FIXED per call, while the wavefront's rounds collapse when
lanes die (pruned keys end the loop). Across a depth-6 scan only ~20-25%
of lanes stay alive on average, so end-to-end the adaptive wavefront wins
(~5 M path-vertices/s vs ~0.8). The grouped path becomes the right
backbone once the render loop regenerates dead lanes (persistent ray
queues -- the BASELINE.json north-star wavefront); kept as an opt-in
backend and documented in TODO.md until then.

A classic batched per-ray BVH stack walk was tried first and measured
~0.3 Mrays/s (no per-lane random access on TPU); see git history.
"""

from __future__ import annotations

import os

from ..scene.types import SceneArrays, SceneStatics
from .treelet import nearest_hit_treelet
from .vec import Vec3


def nearest_hit_bvh(
    ro: Vec3, rd: Vec3, scn: SceneArrays, statics: SceneStatics, tmin=0.0
):
    forced = os.environ.get("RT_TRAVERSE")
    grouped_ok = getattr(scn.bvh, "grouped", None) is not None
    if forced == "grouped" and not grouped_ok:
        raise ValueError("RT_TRAVERSE=grouped requires an all-triangle scene")
    if grouped_ok and forced == "grouped":
        from .grouped import nearest_hit_grouped

        return nearest_hit_grouped(ro, rd, scn, statics, tmin)
    return nearest_hit_treelet(ro, rd, scn, statics, tmin)
