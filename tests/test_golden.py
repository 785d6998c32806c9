"""Golden regression renders.

The Rust reference can't be executed in this environment (no cargo), so the
goldens are pinned statistics of OUR renders at a fixed seed on the CPU
backend: any unintended change to parsing, sampling, shading, or traversal
shifts the per-channel means far beyond the tolerance. Physical correctness
is covered separately (oracle pdf tests, closed-form integrator checks);
this file guards against silent regressions.
"""

import numpy as np
import pytest

from conftest import scene_path
from raytracing_course_2024_tpu.runtime.render import Renderer
from raytracing_course_2024_tpu.scene import load_scene

# (scene, (w, h), spp) -> per-channel mean radiance at seed 0
GOLDEN = {
    ("practice3_1.txt", (64, 48), 8): (0.508024, 0.504795, 0.574348),
    ("practice3_2.txt", (64, 48), 8): (0.093939, 0.045849, 0.023313),
    ("practice3_3.txt", (64, 48), 8): (0.206112, 0.159184, 0.206268),
    ("practice3_4.txt", (48, 48), 8): (0.173044, 0.172514, 0.172068),
    ("practice3_5.txt", (64, 48), 8): (0.202289, 0.211831, 0.144898),
    ("practice7_1.gltf", (64, 36), 8): (0.479286, 0.401971, 0.480897),
}


@pytest.mark.parametrize("key", list(GOLDEN))
def test_golden_means(scenes_dir, key):
    name, (w, h), spp = key
    desc = load_scene(scene_path(name), w, h, spp)
    r = Renderer(desc)
    rad = r.render_radiance(seed=0)
    assert np.isfinite(rad).all()
    got = tuple(float(rad[..., c].mean()) for c in range(3))
    want = GOLDEN[key]
    # identical platform+seed should reproduce near-exactly; the slack only
    # absorbs cross-jax-version numeric drift
    for g, wv in zip(got, want):
        assert abs(g - wv) < 0.015 * max(wv, 0.05), (name, got, want)


def test_backend_agreement(scenes_dir):
    """Dense and treelet backends must agree within MC noise on the same
    scene (different estimators would indicate a traversal bug)."""
    desc = load_scene(scene_path("practice7_1.gltf"), 48, 27, 32)
    dense = Renderer(desc, backend="dense").render_radiance(seed=0)
    bvh = Renderer(desc, backend="bvh").render_radiance(seed=0)
    # identical sampling order + identical hit results => identical images
    assert np.allclose(dense, bvh, rtol=1e-3, atol=1e-3), (
        np.abs(dense - bvh).max()
    )
