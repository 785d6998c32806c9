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
    """Persistent XLA compilation cache: one-shot CLI renders are otherwise
    dominated by (remote) compilation. Opt out with RT_NO_COMPILE_CACHE=1."""
    if _os.environ.get("RT_NO_COMPILE_CACHE"):
        return
    try:
        import jax

        path = _os.environ.get(
            "RT_COMPILE_CACHE", _os.path.expanduser("~/.cache/rt_tpu_jax")
        )
        _os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # noqa: BLE001 -- cache is best-effort
        pass


_enable_compile_cache()

from . import scene  # noqa: F401  (import order: after cache config)
