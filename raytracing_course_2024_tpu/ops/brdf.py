"""BRDF evaluation: glTF metallic-roughness GGX + Lambertian diffuse.

Reference: src/rendering.rs:129-184.

* Schlick Fresnel: F = f0 + (f90 - f0) (1 - |h.l|)^5  (rendering.rs:129-131)
* GGX NDF:   D = alpha^2 X+(h.n) / (pi ((alpha^2-1)(h.n)^2 + 1)^2)
             with alpha = roughness^2 (rendering.rs:158,162-167)
* Smith G:   separable G1(n,l) G1(n,v); G1 = 2 / (1 + sqrt(1 + a^2 tan^2))
             -- algebraically identical to the reference's a/lambda form
             (rendering.rs:168-181) but numerically safe in f32.
* spec = D G / (4 (l.n)(v.n));
  metal_brdf = spec * F(base, 1);
  dielectric_brdf = spec * F(0.04, 1) + diffuse * (1 - F);
  brdf = lerp(dielectric_brdf, metal_brdf, metallic)  (rendering.rs:133-155)

The DIFFUSE material kind (text scenes) evaluates plain Lambertian
``color / pi``; the reference-era practice3 renderer used exactly that.
"""

from __future__ import annotations

import math

import jax.numpy as jnp

from ..scene.types import DIFFUSE
from .vec import Vec3, lerp3, where3

PI = math.pi
_SAFE = 1e-12


from ..utils.math import chi_plus, safe_sqrt  # noqa: F401  (reference src/utils.rs)


def fresnel(f0: Vec3, f90: Vec3, h_dot_l: jnp.ndarray) -> Vec3:
    w = jnp.power(jnp.clip(1.0 - jnp.abs(h_dot_l), 0.0, 1.0), 5.0)
    return f0 + (f90 - f0) * w


def ggx_d(h_dot_n: jnp.ndarray, alpha: jnp.ndarray) -> jnp.ndarray:
    a2 = alpha * alpha
    denom = PI * jnp.square((a2 - 1.0) * h_dot_n * h_dot_n + 1.0)
    return a2 * chi_plus(h_dot_n) / jnp.maximum(denom, _SAFE)


def smith_g1(n_dot_x: jnp.ndarray, alpha: jnp.ndarray) -> jnp.ndarray:
    """G1 = 2 / (1 + sqrt(1 + alpha^2 tan^2 theta)); 0 below the horizon."""
    c2 = jnp.clip(n_dot_x * n_dot_x, _SAFE, 1.0)
    tan2 = (1.0 - c2) / c2
    g1 = 2.0 / (1.0 + jnp.sqrt(1.0 + alpha * alpha * tan2))
    return jnp.where(n_dot_x > 0.0, g1, 0.0)


def specular_brdf(
    l_dot_n: jnp.ndarray,
    v_dot_n: jnp.ndarray,
    h_dot_n: jnp.ndarray,
    alpha: jnp.ndarray,
) -> jnp.ndarray:
    d = ggx_d(h_dot_n, alpha)
    g = smith_g1(l_dot_n, alpha) * smith_g1(v_dot_n, alpha)
    denom = 4.0 * l_dot_n * v_dot_n
    return d * g / jnp.where(jnp.abs(denom) > _SAFE, denom, _SAFE)


def eval_brdf(
    l: Vec3,
    n: Vec3,
    v: Vec3,
    color: Vec3,
    metallic: jnp.ndarray,
    roughness: jnp.ndarray,
    mkind: jnp.ndarray,
) -> Vec3:
    """Vectorized BRDF for the sampled-lobe materials (DIFFUSE and PBR).

    Delta materials (MIRROR / DIELECTRIC) never reach this function -- the
    integrator updates their throughput directly.
    """
    h = (l + v).normalize()
    diffuse = color / PI

    alpha = roughness * roughness
    spec = specular_brdf(l.dot(n), v.dot(n), h.dot(n), alpha)
    h_dot_l = h.dot(l)
    one = Vec3.full(1.0)
    metal = Vec3(spec, spec, spec).mul(fresnel(color, one, h_dot_l))
    f_diel = fresnel(Vec3.full(0.04), one, h_dot_l)
    dielectric = Vec3(spec, spec, spec).mul(f_diel) + diffuse.mul(one - f_diel)
    pbr = lerp3(dielectric, metal, metallic)

    return where3(mkind == DIFFUSE, diffuse, pbr)
