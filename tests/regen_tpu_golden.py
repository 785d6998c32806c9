"""Regenerate the real-TPU golden renders (tests/tpu_goldens.npz).

Run ON TPU HARDWARE (one chip, no other TPU process):

    cd /root/repo && python tests/regen_tpu_golden.py

Commit the updated .npz together with whatever change altered the TPU
sample stream (Pallas sampler layout, hardware-PRNG seeding, megakernel
scope). The goldens pin the TPU-only code paths -- the Pallas fused
sampler with its hardware-PRNG stream and, for the bvh entry, the
traversal backends -- that the CPU goldens (tests/goldens.npz, threefry
stream) cannot see.

The comparison (test_tpu_golden.py) is statistical, not bitwise: TPU
renders are deterministic per seed TODAY, but the hardware PRNG stream is
not contractually stable across libtpu versions, so the test checks
channel means and 4x4-block means against the committed render at
Monte-Carlo tolerances. That still catches the regressions that matter:
estimator drift, broken sampler math, traversal bugs.
"""

import os
import sys

import numpy as np

CONFIGS = [
    # (name, scene, w, h, spp, backend)
    ("practice7_1_dense", "practice7_1.gltf", 64, 36, 32, "dense"),
    ("practice7_3_bvh", "practice7_3.gltf", 48, 27, 8, "bvh"),
]


def main():
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import jax

    assert jax.default_backend() in ("tpu", "axon") or "TPU" in str(
        jax.devices()[0]
    ), f"run on TPU hardware, got {jax.devices()}"
    from raytracing_course_2024_tpu.runtime.render import Renderer
    from raytracing_course_2024_tpu.scene import SCENES_DIR, load_scene

    out = {}
    for name, scene, w, h, spp, backend in CONFIGS:
        desc = load_scene(os.path.join(SCENES_DIR, scene), w, h, spp)
        r = Renderer(desc, backend=backend)
        img = r.render_radiance(seed=0, samples=spp)
        out[name] = np.asarray(img, np.float32)
        print(f"{name}: mean {img.mean():.5f}")
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "tpu_goldens.npz")
    np.savez_compressed(path, **out)
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
