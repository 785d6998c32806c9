"""Degenerate-scene edge cases the course files never exercise."""

import numpy as np
import pytest

from raytracing_course_2024_tpu.runtime.render import Renderer
from raytracing_course_2024_tpu.scene import parse_text_scene

HEADER = """
DIMENSIONS 16 12
RAY_DEPTH {depth}
SAMPLES 4
BG_COLOR 0.25 0.5 0.75
CAMERA_POSITION 0 0 5
CAMERA_RIGHT 1 0 0
CAMERA_UP 0 1 0
CAMERA_FORWARD 0 0 -1
CAMERA_FOV_X 1.0
"""


def test_empty_scene_is_background():
    rad = Renderer(parse_text_scene(HEADER.format(depth=3))).render_radiance()
    assert np.allclose(rad[..., 0], 0.25, atol=1e-6)
    assert np.allclose(rad[..., 1], 0.5, atol=1e-6)
    assert np.allclose(rad[..., 2], 0.75, atol=1e-6)


def test_single_primitive():
    scene = HEADER.format(depth=2) + """
NEW_PRIMITIVE
ELLIPSOID 1 1 1
POSITION 0 0 0
COLOR 0.9 0.1 0.1
"""
    rad = Renderer(parse_text_scene(scene)).render_radiance()
    assert np.isfinite(rad).all()
    # background at the corner; the red diffuse sphere (lit by the bg via
    # one bounce) in the middle: red dominates blue there
    assert rad[0, 0, 2] > 0.7
    assert rad[6, 8, 0] > 2.0 * rad[6, 8, 2]
    assert rad[6, 8, 2] < 0.2


def test_depth_one_only_emission():
    """RAY_DEPTH 1: a single intersection level -- emission/background only,
    no scattering (the reference's depth<=0 cutoff one level up)."""
    scene = HEADER.format(depth=1) + """
NEW_PRIMITIVE
BOX 1 1 1
POSITION 0 0 0
COLOR 1 1 1
EMISSION 2 3 4
"""
    rad = Renderer(parse_text_scene(scene)).render_radiance()
    center = rad[6, 8]
    assert np.allclose(center, [2, 3, 4], atol=1e-5)


def test_deep_recursion_mirror_box():
    """Depth 16 inside a mirror box: rays bounce many times without NaNs;
    with mirrors only and no lights, everything must be exactly 0."""
    scene = """
DIMENSIONS 8 8
RAY_DEPTH 16
SAMPLES 2
BG_COLOR 0 0 0
CAMERA_POSITION 0 0 0
CAMERA_RIGHT 1 0 0
CAMERA_UP 0 1 0
CAMERA_FORWARD 0 0 -1
CAMERA_FOV_X 1.0
NEW_PRIMITIVE
BOX 3 3 3
POSITION 0 0 0
COLOR 0.9 0.9 0.9
METALLIC
"""
    rad = Renderer(parse_text_scene(scene)).render_radiance()
    assert np.isfinite(rad).all()
    assert np.allclose(rad, 0.0, atol=1e-6)


def test_light_only_scene():
    """A scene that is a single emissive primitive and nothing else."""
    scene = HEADER.format(depth=4) + """
NEW_PRIMITIVE
ELLIPSOID 0.5 0.5 0.5
POSITION 0 0 0
EMISSION 7 7 7
"""
    rad = Renderer(parse_text_scene(scene)).render_radiance()
    assert np.isfinite(rad).all()
    assert abs(rad[6, 8, 0] - 7.0) < 1e-4  # direct view of the emitter


def test_zero_samples_rejected():
    desc = parse_text_scene(HEADER.format(depth=2))
    desc.settings.samples = 1
    rad = Renderer(desc).render_radiance(samples=1)
    assert np.isfinite(rad).all()


@pytest.mark.parametrize("depth", [1, 2, 7])
def test_odd_depths_and_sizes(depth):
    """Non-power-of-two frame + odd depth exercise padding paths."""
    scene = (
        HEADER.format(depth=depth)
        .replace("DIMENSIONS 16 12", "DIMENSIONS 13 7")
    ) + """
NEW_PRIMITIVE
TRIANGLE -1 -1 0  1 -1 0  0 1 0
COLOR 0.5 0.5 0.5
"""
    rad = Renderer(parse_text_scene(scene)).render_radiance()
    assert rad.shape == (7, 13, 3)
    assert np.isfinite(rad).all()
