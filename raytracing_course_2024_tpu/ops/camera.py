"""Camera ray generation (reference src/rendering.rs:71-84).

Per-pixel jittered primary rays::

    px = (2 (x + u) / w - 1) *  tan(fov_x / 2)
    py = -(2 (y + v) / h - 1) * tan(fov_y / 2)
    dir = normalize(px * right + py * up + forward)

with u, v ~ U(0, 1) stratification jitter.
"""

from __future__ import annotations

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..scene.types import CameraDesc
from .vec import Vec3


class CameraArrays(NamedTuple):
    """Device-resident camera basis (all (3,) f32) + precomputed tangents."""

    position: jnp.ndarray
    right: jnp.ndarray
    up: jnp.ndarray
    forward: jnp.ndarray
    tan_half_fov_x: jnp.ndarray
    tan_half_fov_y: jnp.ndarray


def camera_arrays(cam: CameraDesc) -> CameraArrays:
    import numpy as np

    return CameraArrays(
        position=jnp.asarray(np.asarray(cam.position), jnp.float32),
        right=jnp.asarray(np.asarray(cam.right), jnp.float32),
        up=jnp.asarray(np.asarray(cam.up), jnp.float32),
        forward=jnp.asarray(np.asarray(cam.forward), jnp.float32),
        tan_half_fov_x=jnp.float32(math.tan(cam.fov_x * 0.5)),
        tan_half_fov_y=jnp.float32(math.tan(cam.fov_y * 0.5)),
    )


def generate_rays(
    cam: CameraArrays,
    px: jnp.ndarray,  # (B,) pixel x integer coords
    py: jnp.ndarray,  # (B,) pixel y integer coords
    width: int,
    height: int,
    key: jax.Array,
):
    """Returns (origin Vec3 (B,), direction Vec3 (B,) unit)."""
    from .sampling import uniform_rows

    b = px.shape[0]
    u = uniform_rows(key, 2, b)
    return generate_rays_u(cam, px, py, width, height, u[0], u[1])


def generate_rays_u(
    cam: CameraArrays,
    px: jnp.ndarray,
    py: jnp.ndarray,
    width: int,
    height: int,
    u0: jnp.ndarray,
    u1: jnp.ndarray,
):
    """``generate_rays`` with caller-supplied jitter draws (the wavefront
    engine keys its jitter by work item, not by lane -- ops/rng.py)."""
    real_x = px.astype(jnp.float32) + u0
    real_y = py.astype(jnp.float32) + u1
    sx = (2.0 * real_x / width - 1.0) * cam.tan_half_fov_x
    sy = -(2.0 * real_y / height - 1.0) * cam.tan_half_fov_y

    def axis(i):
        return sx * cam.right[i] + sy * cam.up[i] + cam.forward[i]

    d = Vec3(axis(0), axis(1), axis(2)).normalize()
    # derive the origin from d's zero so its (possibly device-varying) type
    # matches the direction under shard_map -- a plain broadcast_to of the
    # camera constant would be mesh-invariant and break scan carries
    zero = d.x * 0.0
    o = Vec3(zero + cam.position[0], zero + cam.position[1], zero + cam.position[2])
    return o, d
