"""Device-chained per-bounce traversal timing on a big mesh (GAP.md ladder).

Times ONE traversal call per iteration of a fori_loop whose ray directions
are data-dependent on the previous iteration's hit (so the relay cannot
overlap or elide iterations -- the only honest microbench shape on the
axon tunnel, CLAUDE.md perf rules). Rays are bounce-like: origins at hit
points of a real camera batch, directions cosine-scattered from the hit
normal via a cheap LCG-ish hash of the iteration index.

Usage:  python _probes/prof_traverse.py [scene] [lanes] [iters]
Env: RT_SLOTS / RT_TREELET_R0 / RT_TREELET_CAPDIV respected (they
configure the treelet backend underneath nearest_hit_bvh).
Prints one JSON line: {"ms_per_bounce": ..., "config": {...}}.
"""

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SCENE = sys.argv[1] if len(sys.argv) > 1 else "practice7_3.gltf"
LANES = int(sys.argv[2]) if len(sys.argv) > 2 else 262144
ITERS = int(sys.argv[3]) if len(sys.argv) > 3 else 24


def main():
    import jax
    import jax.numpy as jnp

    from raytracing_course_2024_tpu.ops.traverse import nearest_hit_bvh
    from raytracing_course_2024_tpu.ops.vec import Vec3
    from raytracing_course_2024_tpu.runtime.render import Renderer
    from raytracing_course_2024_tpu.scene import SCENES_DIR, load_scene

    desc = load_scene(os.path.join(SCENES_DIR, SCENE), 1280, 720, 4)
    r = Renderer(desc, batch_size=LANES)
    arrays, statics = r.arrays, r.statics

    # bounce-like seed rays: a real camera batch's hits
    cam = r.settings.camera
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 4)
    px = jax.random.uniform(ks[0], (LANES,)) * 2 - 1
    py = jax.random.uniform(ks[1], (LANES,)) * 2 - 1
    t_fx = jnp.tan(jnp.float32(cam.fov_x / 2))
    t_fy = t_fx * (720.0 / 1280.0)
    ro0 = Vec3(*(jnp.full((LANES,), jnp.float32(c)) for c in cam.position))
    rd0 = Vec3(
        cam.right[0] * px * t_fx + cam.up[0] * py * t_fy + cam.forward[0],
        cam.right[1] * px * t_fx + cam.up[1] * py * t_fy + cam.forward[1],
        cam.right[2] * px * t_fx + cam.up[2] * py * t_fy + cam.forward[2],
    ).normalize()
    hit0 = nearest_hit_bvh(ro0, rd0, arrays, statics)
    t0 = jnp.where(jnp.isfinite(hit0.t), hit0.t, 1.0)
    i0 = hit0.idx.astype(jnp.float32)
    start = Vec3(ro0.x + rd0.x * t0 * 0.999, ro0.y + rd0.y * t0 * 0.999,
                 ro0.z + rd0.z * t0 * 0.999)

    def body(i, carry):
        ox, oy, oz, sx, sy, sz = carry
        # scatter: direction depends on previous hit t (data dependence)
        h = (sx * 12.9898 + sy * 78.233 + sz * 37.719 + i * 0.618) * 43758.5
        a = (h - jnp.floor(h)) * 6.2831853
        b = (h * 0.731 - jnp.floor(h * 0.731)) * 2.0 - 1.0
        s = jnp.sqrt(jnp.maximum(1.0 - b * b, 0.0))
        rd = Vec3(s * jnp.cos(a), b, s * jnp.sin(a))
        ro = Vec3(ox, oy, oz)
        hit = nearest_hit_bvh(ro, rd, arrays, statics)
        t = jnp.where(jnp.isfinite(hit.t), hit.t * 0.999, 0.0)
        return (ox + rd.x * t * 1e-6, oy, oz,
                sx + t, sy + hit.idx.astype(jnp.float32), sz + t * 0.5)

    @jax.jit
    def chain(n, carry):
        return jax.lax.fori_loop(0, n, body, carry)

    carry0 = (start.x, start.y, start.z, t0, i0, t0 * 0.5)
    out = chain(2, carry0)  # compile
    jax.block_until_ready(out)
    t_start = time.perf_counter()
    out = chain(ITERS, carry0)
    jax.block_until_ready(out)
    wall = time.perf_counter() - t_start
    cfg = {k: os.environ[k] for k in os.environ if k.startswith("RT_")}
    print(json.dumps({
        "scene": SCENE, "lanes": LANES, "iters": ITERS,
        "ms_per_bounce": round(wall / ITERS * 1e3, 2),
        "mrays_per_s_traversal_only": round(LANES * ITERS / wall / 1e6, 2),
        "config": cfg,
    }), flush=True)


if __name__ == "__main__":
    main()
