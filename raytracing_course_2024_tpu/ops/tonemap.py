"""ACES tonemap + gamma encode (reference src/rendering.rs:228-262).

Narkowicz ACES-approx coefficients 2.51 / 0.03 / 2.43 / 0.59 / 0.14, then
gamma 1/2.2, then round to u8.
"""

from __future__ import annotations

import jax.numpy as jnp


def aces_tonemap(x: jnp.ndarray) -> jnp.ndarray:
    a, b, c, d, e = 2.51, 0.03, 2.43, 0.59, 0.14
    return jnp.clip((x * (a * x + b)) / (x * (c * x + d) + e), 0.0, 1.0)


def color_to_u8(color: jnp.ndarray) -> jnp.ndarray:
    """(..., 3) linear radiance -> (..., 3) u8 sRGB-ish pixels."""
    tonemapped = aces_tonemap(color)
    gamma = jnp.power(jnp.maximum(tonemapped, 0.0), 1.0 / 2.2)
    return jnp.round(gamma * 255.0).astype(jnp.uint8)
