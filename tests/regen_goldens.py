"""Regenerate tests/goldens.npz -- per-pixel golden radiance arrays.

Run after ANY change to the sample stream (RNG layout, sampler order,
candidate count): `python tests/regen_goldens.py`, commit the npz in the
same commit as the change (CLAUDE.md rule).

Goldens are seed-0 renders on the forced-CPU backend at small resolutions
(the Rust reference can't run here -- no cargo -- so these pin OUR renders;
physical correctness is covered by the oracle/closed-form tests, and
pixel-level storage catches spatial errors a channel mean cannot: flips,
tile swaps, transposes -- VERDICT r1 weak #3).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
SCENES = os.environ.get("RT_SCENES_DIR", "/root/reference/scenes")

# (scene, (w, h), spp) -- identical set to round 1's mean-goldens
CONFIGS = [
    ("practice3_1.txt", (64, 48), 8),
    ("practice3_2.txt", (64, 48), 8),
    ("practice3_3.txt", (64, 48), 8),
    ("practice3_4.txt", (48, 48), 8),
    ("practice3_5.txt", (64, 48), 8),
    ("practice7_1.gltf", (64, 36), 8),
]


def main():
    from raytracing_course_2024_tpu.runtime.render import Renderer
    from raytracing_course_2024_tpu.scene import load_scene

    out = {}
    for name, (w, h), spp in CONFIGS:
        desc = load_scene(os.path.join(SCENES, name), w, h, spp)
        rad = Renderer(desc).render_radiance(seed=0)
        out[f"{name}|{w}x{h}|{spp}"] = np.asarray(rad, np.float32)
        print(f"{name}: mean={rad.mean():.6f}")
    path = os.path.join(HERE, "goldens.npz")
    np.savez_compressed(path, **out)
    print(f"wrote {path} ({os.path.getsize(path)} bytes)")


if __name__ == "__main__":
    main()
