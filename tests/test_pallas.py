"""Pallas dense-intersect kernel vs the XLA sweep (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from conftest import scene_path
from raytracing_course_2024_tpu.ops.pallas_intersect import (
    pallas_dense_nearest,
    prepare_tri_pack,
)
from raytracing_course_2024_tpu.ops.scene_intersect import nearest_hit_dense
from raytracing_course_2024_tpu.ops.vec import Vec3
from raytracing_course_2024_tpu.scene import build_scene_arrays, load_scene


def test_pallas_matches_xla_sweep(scenes_dir, rng, monkeypatch):
    desc = load_scene(scene_path("practice7_1.gltf"), 16, 16, 1)
    arrays, statics = build_scene_arrays(desc)
    assert arrays.tri_pack is not None  # 36 tris, all-triangle -> eligible
    arrays_j = jax.tree.map(jnp.asarray, arrays)

    b = 3000  # deliberately not a BLK multiple (padding path)
    o = rng.uniform(-1, 1, (b, 3)) + np.array([0, 1, 0])
    d = rng.normal(size=(b, 3))
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    ro = Vec3(*[jnp.asarray(o[:, i], jnp.float32) for i in range(3)])
    rd = Vec3(*[jnp.asarray(d[:, i], jnp.float32) for i in range(3)])

    t_p, i_p = pallas_dense_nearest(ro, rd, arrays_j.tri_pack)

    # XLA reference path (force the non-pallas branch)
    import raytracing_course_2024_tpu.ops.scene_intersect as SI

    monkeypatch.setattr(SI, "_NO_PALLAS", True)
    hd = nearest_hit_dense(ro, rd, arrays_j, statics)

    valid = np.asarray(hd.valid)
    assert np.array_equal(valid, np.isfinite(np.asarray(t_p)))
    assert np.allclose(
        np.asarray(t_p)[valid], np.asarray(hd.t)[valid], rtol=2e-5, atol=2e-5
    )
    ids_match = np.asarray(i_p) == np.asarray(hd.idx)
    assert (ids_match | ~valid).mean() > 0.999


@pytest.mark.slow
def test_pallas_used_in_renderer(scenes_dir):
    """The flagship scene's renderer actually routes through the kernel."""
    from raytracing_course_2024_tpu.runtime.render import Renderer

    desc = load_scene(scene_path("practice7_1.gltf"), 32, 18, 2)
    r = Renderer(desc)
    assert r.arrays.tri_pack is not None
    img = r.render_radiance(seed=0)
    assert np.isfinite(img).all() and img.max() > 0.01
