"""TPU-native Monte-Carlo path tracer.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
metametamoon/raytracing-course-2024 (a Rust CPU path tracer): text + glTF
scene ingestion, SAH BVH, one-sample-MIS path tracing with glTF
metallic-roughness BRDF and GGX-VNDF sampling, ACES output -- designed
TPU-first (SoA scenes, lane-major ray batches, lax.scan bounce loop,
shard_map multi-chip tiling) rather than ported.
"""

__version__ = "0.1.0"

from . import scene  # noqa: F401
