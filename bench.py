"""Headline benchmark: Mrays/sec/chip on practice7_1 (Cornell box, glTF).

Metric contract (BASELINE.json:2): Mrays/sec/chip + wall-time for a
1280x720 @ 256 spp frame. Rays = path vertices (one scene intersection per
live bounce), counted exactly by the instrumented integrator -- the same
accounting SURVEY.md section 6 uses (~1.4 G vertices for that frame).

The run measures steady-state throughput at RT_BENCH_SPP (default 16 --
throughput is spp-invariant since the program is identical per sample) and
reports the exact measured Mrays/s; the 256-spp wall-time it implies is
printed as context. vs_baseline is against the 200 Mrays/s/chip north-star
target (BASELINE.json:5) -- the reference itself publishes no numbers
(BASELINE.md).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from raytracing_course_2024_tpu.integrator.path import TraceConfig, render_pixels
    from raytracing_course_2024_tpu.ops.camera import camera_arrays
    from raytracing_course_2024_tpu.scene import SCENES_DIR, load_scene
    from raytracing_course_2024_tpu.scene.build import build_scene_arrays

    width = int(os.environ.get("RT_BENCH_W", "1280"))
    height = int(os.environ.get("RT_BENCH_H", "720"))
    spp = int(os.environ.get("RT_BENCH_SPP", "16"))
    scene = os.environ.get(
        "RT_BENCH_SCENE", os.path.join(SCENES_DIR, "practice7_1.gltf")
    )

    desc = load_scene(scene, width, height, spp)
    arrays, statics = build_scene_arrays(desc)
    if statics.num_prims > 2048:
        from raytracing_course_2024_tpu.ops.bvh import attach_bvh

        arrays = attach_bvh(arrays, statics)
        backend = "bvh"
    else:
        backend = "dense"
    arrays = jax.tree.map(jnp.asarray, arrays)
    cam = camera_arrays(desc.settings.camera)
    cfg = TraceConfig(
        ray_depth=desc.settings.ray_depth,
        bg_color=tuple(desc.settings.bg_color),
        backend=backend,
    )

    batch = int(os.environ.get("RT_BENCH_BATCH", "1048576"))
    total = width * height
    batch = min(batch, total)
    num_batches = -(-total // batch)

    # ALL index math lives inside the one jitted program: on this TPU tunnel
    # every distinct host-side op fragment is its own remotely-compiled
    # executable with a ~1.5 s first-use cost.
    @jax.jit
    def run(key, offset):
        lin = jnp.arange(batch, dtype=jnp.int32)
        idx = jnp.minimum(lin + offset, total - 1)
        return render_pixels(
            key, idx % width, idx // width, cam, arrays, statics, cfg,
            width, height, spp, with_stats=True,
        )

    key = jax.random.PRNGKey(0)

    # warmup: compile + one-off device autotune pass (the first post-compile
    # execution is ~6x slower than steady state on the axon tunnel)
    for w in range(2):
        out, nrays = run(jax.random.fold_in(key, 1000 + w), jnp.int32(0))
        out.block_until_ready()

    reps = int(os.environ.get("RT_BENCH_REPS", "3"))
    t0 = time.perf_counter()
    total_rays = 0.0
    for rep in range(reps):
        for i in range(num_batches):
            out, nrays = run(
                jax.random.fold_in(key, rep * num_batches + i),
                jnp.int32(i * batch),
            )
            total_rays += float(nrays)
    dt = (time.perf_counter() - t0) / reps
    total_rays /= reps

    mrays = total_rays / dt / 1e6
    wall_256 = dt * 256 / spp
    scene_name = os.path.basename(scene)
    print(
        f"# {scene_name} {width}x{height} @ {spp} spp ({backend}): {dt:.2f}s, "
        f"{total_rays/1e6:.1f} M path-vertices, {mrays:.1f} Mrays/s; "
        f"implied 256-spp frame: {wall_256:.1f}s",
        file=sys.stderr,
    )
    print(
        json.dumps(
            {
                "metric": f"Mrays/sec/chip, {scene_name} {width}x{height} path vertices",
                "value": round(mrays, 2),
                "unit": "Mrays/s",
                "vs_baseline": round(mrays / 200.0, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
