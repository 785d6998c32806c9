"""TPU-native Monte-Carlo path tracer.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
metametamoon/raytracing-course-2024 (a Rust CPU path tracer): text + glTF
scene ingestion, SAH BVH, one-sample-MIS path tracing with glTF
metallic-roughness BRDF and GGX-VNDF sampling, ACES output -- designed
TPU-first (SoA scenes, lane-major ray batches, lax.scan bounce loop,
shard_map multi-chip tiling) rather than ported.
"""

__version__ = "0.1.0"

import os as _os


def _enable_compile_cache():
    """Opt-in persistent XLA compilation cache (RT_COMPILE_CACHE=<dir>).

    Off by default: on this image's axon remote-compile tunnel the cache
    was measured actively harmful for large programs (a 256-spp render:
    38 s cold WITHOUT the cache vs 80-195 s WITH it -- misses plus slow
    giant-executable (de)serialization). On a conventional jaxlib install
    it behaves normally and helps one-shot CLI renders."""
    path = _os.environ.get("RT_COMPILE_CACHE")
    if not path:
        return
    try:
        import jax

        _os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # noqa: BLE001 -- cache is best-effort
        pass


_enable_compile_cache()

from . import scene  # noqa: F401  (import order: after cache config)
