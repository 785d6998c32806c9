"""Scalar math helpers (reference src/utils.rs)."""

from __future__ import annotations

import jax.numpy as jnp


def safe_sqrt(x):
    """sqrt clamped at 0 (src/utils.rs:3-5)."""
    return jnp.sqrt(jnp.maximum(x, 0.0))


def chi_plus(x):
    """Heaviside step (src/utils.rs:7-13)."""
    return jnp.where(x > 0.0, 1.0, 0.0)


def almost_equal(x, y, eps: float = 1e-4):
    """EPS comparator (src/utils.rs:15-21), f32-retuned."""
    return jnp.abs(x - y) < eps
