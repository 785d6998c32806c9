"""Fused-bounce megakernel (ops/pallas_bounce.py) tests.

The interpreter's hardware-PRNG stand-in is degenerate (same caveat as
tests/test_pallas_sampler.py), so CPU runs only validate plumbing: shapes,
finiteness, aliveness monotonicity, and the intersect/detail stages
against the XLA pipeline with sampling factored out. The full statistical
image comparison runs on real TPU (RT_TEST_TPU=1), where the kernel is
the production headline path.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from conftest import scene_path
from raytracing_course_2024_tpu.integrator.path import TraceConfig, render_pixels
from raytracing_course_2024_tpu.ops.camera import camera_arrays, generate_rays
from raytracing_course_2024_tpu.ops.pallas_bounce import (
    bounce_pallas,
    megakernel_eligible,
)
from raytracing_course_2024_tpu.ops.vec import Vec3
from raytracing_course_2024_tpu.scene import build_scene_arrays, load_scene

ON_TPU = bool(os.environ.get("RT_TEST_TPU"))


def _cornell(w=64, h=36, spp=2):
    desc = load_scene(scene_path("practice7_1.gltf"), w, h, spp)
    arrays, statics = build_scene_arrays(desc)
    return desc, jax.tree.map(jnp.asarray, arrays), statics


def test_eligibility():
    desc, arrays, statics = _cornell()
    assert megakernel_eligible(statics, arrays)
    assert not statics.any_delta


def test_plumbing_interpret():
    """One kernel bounce in interpret mode: state shapes, finiteness, and
    the intersect+emission stages (RNG-independent) match the XLA bounce."""
    desc, arrays, statics = _cornell()
    cam = camera_arrays(desc.settings.camera)
    b = 64 * 36
    idx = jnp.arange(b, dtype=jnp.int32)
    key = jax.random.PRNGKey(0)
    ro, rd = generate_rays(cam, idx % 64, idx // 64, 64, 36, key)
    ones = jnp.ones((b,))
    zeros = jnp.zeros((b,))
    alive = ones > 0.0
    ro2, rd2, thr, rad, alive2 = bounce_pallas(
        key, ro, rd, Vec3(ones, ones, ones), Vec3(zeros, zeros, zeros),
        alive, arrays, statics, (0.0, 0.0, 0.0),
    )
    for c in (ro2.x, rd2.x, thr.x, rad.x):
        assert c.shape == (b,)
        assert np.isfinite(np.asarray(c)).all()
    # primary rays from the camera all hit the closed Cornell box: the
    # radiance after bounce 1 is the (emission-only) light pane
    a2 = np.asarray(alive2)
    assert a2.mean() > 0.0  # some survived sampling
    # emission accumulation matches the XLA collect stage exactly
    from raytracing_course_2024_tpu.ops.scene_intersect import (
        nearest_hit_dense,
        surface_detail,
    )

    hit = nearest_hit_dense(ro, rd, arrays, statics)
    surf = surface_detail(ro, rd, hit, arrays, statics)
    want = np.asarray(surf.emission.x)
    got = np.asarray(rad.x)
    assert np.allclose(got, want, atol=1e-5)
    # rays that died in sampling must carry zero throughput
    assert np.all(np.asarray(thr.x)[~a2] == 0.0)
    # hit points agree with the XLA detail stage
    assert np.allclose(
        np.asarray(ro2.x)[a2], np.asarray(surf.point.x)[a2], atol=1e-5
    )


@pytest.mark.skipif(
    not (
        os.environ.get("RT_TEST_MEGAKERNEL") or os.environ.get("RT_TEST_TPU")
    ),
    reason="needs a real TPU (RT_TEST_TPU=1); the round-2 intermittent "
    "device fault did not reproduce in a 120-invocation soak "
    "(ROUNDLOG_r03.md), so this is now part of the standard TPU suite",
)
def test_megakernel_matches_xla_image_tpu():
    """Full-render statistical parity: megakernel vs XLA bounce at 64 spp
    must agree within Monte-Carlo noise (channel means ~1%)."""
    w, h, spp = 160, 90, 64
    desc, arrays, statics = _cornell(w, h, spp)
    cam = camera_arrays(desc.settings.camera)
    cfg = TraceConfig(
        ray_depth=desc.settings.ray_depth, bg_color=tuple(desc.settings.bg_color)
    )
    b = w * h
    idx = jnp.arange(b, dtype=jnp.int32)
    os.environ["RT_MEGAKERNEL"] = "1"
    try:
        mega = np.asarray(
            render_pixels(
                jax.random.PRNGKey(0), idx % w, idx // w, cam, arrays, statics,
                cfg, w, h, spp,
            )
        )
        os.environ["RT_MEGAKERNEL"] = "0"
        xla = np.asarray(
            render_pixels(
                jax.random.PRNGKey(1), idx % w, idx // w, cam, arrays, statics,
                cfg, w, h, spp,
            )
        )
    finally:
        os.environ.pop("RT_MEGAKERNEL", None)
    mm, xm = mega.mean(axis=1), xla.mean(axis=1)  # (3, B) SoA
    rel = np.abs(mm - xm) / np.maximum(xm, 1e-9)
    assert (rel < 0.02).all(), (mm, xm)
    # spatial agreement: tile means within the MC-noise scale (an
    # XLA-vs-XLA control with different keys measures 0.092 at this spp)
    tm = mega.reshape(h // 18, 18, w // 20, 20, 3).mean(axis=(1, 3))
    tx = xla.reshape(h // 18, 18, w // 20, 20, 3).mean(axis=(1, 3))
    assert np.abs(tm - tx).max() / max(xm.max(), 1e-9) < 0.15


def test_no_light_scene_eligible_and_runs():
    """A bg-lit all-triangle scene (zero emissive prims) must stay
    megakernel-eligible and run: the light table is padded to >= 1 row at
    build time (scene/build.py), so the kernel's light operand never has a
    zero-sized dim (ADVICE r2 #1 verified-by-test)."""
    from raytracing_course_2024_tpu.scene.types import PrimitiveDesc
    from meshes import icosphere, mesh_scene_desc

    verts, faces = icosphere(0)
    desc = mesh_scene_desc(
        verts, faces, width=8, height=8, samples=2, with_light=False,
        bg=(0.7, 0.8, 0.9),
    )
    arrays, statics = build_scene_arrays(desc)
    arrays = jax.tree.map(jnp.asarray, arrays)
    assert statics.num_lights == 0
    assert megakernel_eligible(statics, arrays)
    assert arrays.light_packed.shape[1] >= 1  # padded, never zero-sized
    b = 64
    idx = jnp.arange(b, dtype=jnp.int32)
    cam = camera_arrays(desc.settings.camera)
    ro, rd = generate_rays(cam, idx % 8, idx // 8, 8, 8, jax.random.PRNGKey(0))
    ones = jnp.ones((b,))
    zeros = jnp.zeros((b,))
    ro2, rd2, thr, rad, alive2 = bounce_pallas(
        jax.random.PRNGKey(1), ro, rd, Vec3(ones, ones, ones),
        Vec3(zeros, zeros, zeros), ones > 0.0, arrays, statics,
        tuple(desc.settings.bg_color),
    )
    assert np.isfinite(np.asarray(rad.x)).all()
