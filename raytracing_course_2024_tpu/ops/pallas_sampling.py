"""Pallas TPU kernel: the whole MIS mixture-sampling stage in one kernel.

The XLA formulation of ops.sampling.sample_mixture spans ~25 fusions per
bounce (threefry sweep, K candidate samplers, accept/select, mixture pdf),
each costing an HBM round-trip of its (K*B,) intermediates. This kernel
runs the entire stage per BLK-ray block inside VMEM:

* RNG: the TPU hardware PRNG (pltpu.prng_random_bits), seeded per grid
  block from the caller's threefry key -- a different (but equally
  deterministic) stream than the XLA path, so renders differ within MC
  noise between samplers;
* K candidates drawn and first-accept selected with a sequentially
  unrolled loop (registers, no cumsum);
* the mixture pdf evaluated for the selected candidate only, reusing the
  exact jnp math from ops.sampling (those functions are pure elementwise
  jnp and trace fine inside a Pallas body; the light table rides along as
  a small VMEM block).

Off-TPU it runs in interpreter mode (tests compare it statistically and
pointwise-pdf against the XLA sampler).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..scene.types import SceneArrays, SceneStatics
from .pallas_intersect import vma_union
from .sampling import (
    _SAFE,
    pdf_cosine,
    pdf_lights_lp,
    pdf_vndf,
    sample_cosine_u,
    sample_light_dir_u,
    sample_vndf_u,
)
from .vec import Vec3, where3

BLK = 8192


def make_unif(blk: int):
    """Uniform [0,1) draw from the TPU hardware PRNG (seed separately)."""

    def unif():
        # rank>=2 required by the Mosaic PRNG lowering
        bits = pltpu.prng_random_bits((8, blk // 8))
        # top 24 bits -> [0, 1) with 2^-24 resolution (logical shift keeps
        # this correct for either signedness)
        top = jax.lax.shift_right_logical(bits, jnp.array(8, bits.dtype))
        return (
            top.astype(jnp.float32) * jnp.float32(1.0 / (1 << 24))
        ).reshape(blk)

    return unif


def mixture_body(unif, point, n, ns, v, roughness, lp, statics, k_tries):
    """The whole MIS mixture-sampling stage as in-kernel math.

    Shared by the standalone sampler kernel below and the fused-bounce
    megakernel (ops/pallas_bounce.py). Returns (l, pdf, accepted)."""
    n_comp = 3 if statics.num_lights > 0 else 2
    zero = point.x * 0.0
    sel = Vec3(zero, zero, zero + 1.0)
    accepted = zero > 1.0  # all-False

    for _ in range(k_tries):
        which = jnp.minimum((unif() * n_comp).astype(jnp.int32), n_comp - 1)
        u1, u2 = unif(), unif()
        cand = sample_cosine_u(u1, u2, n)
        cand = where3(which == 1, sample_vndf_u(u1, u2, n, v, roughness), cand)
        if statics.num_lights > 0:
            us = [u1, u2, unif(), unif(), unif(), unif()]
            cand = where3(
                which == 2, sample_light_dir_u(us, point, lp, statics), cand
            )
        ok = (cand.dot(ns) > 0.0) & (cand.dot(n) > 0.0)
        take = ok & ~accepted
        sel = where3(take, cand, sel)
        accepted = accepted | ok

    pdf = pdf_cosine(n, sel) + pdf_vndf(n, sel, v, roughness)
    if statics.num_lights > 0:
        pdf = pdf + pdf_lights_lp(point, sel, lp, statics)
    pdf = pdf / n_comp
    accepted = accepted & (pdf > _SAFE)
    return sel, jnp.maximum(pdf, _SAFE), accepted


def _kernel(statics: SceneStatics, k_tries: int, seed_ref, px, py, pz,
            ngx, ngy, ngz, nsx, nsy, nsz, vx, vy, vz, rough, lp_ref,
            lx_ref, ly_ref, lz_ref, pdf_ref, ok_ref):
    # per-block stream: Knuth multiplier 2654435761 as i32 (wraps)
    pltpu.prng_seed(seed_ref[0] + pl.program_id(0) * jnp.int32(-1640531527))
    unif = make_unif(BLK)

    point = Vec3(px[:], py[:], pz[:])
    n = Vec3(ngx[:], ngy[:], ngz[:])
    ns = Vec3(nsx[:], nsy[:], nsz[:])
    v = Vec3(vx[:], vy[:], vz[:])
    lp = lp_ref[:, :] if statics.num_lights > 0 else None

    sel, pdf, accepted = mixture_body(
        unif, point, n, ns, v, rough[:], lp, statics, k_tries
    )
    lx_ref[:] = sel.x
    ly_ref[:] = sel.y
    lz_ref[:] = sel.z
    pdf_ref[:] = pdf
    ok_ref[:] = accepted.astype(jnp.float32)


@functools.partial(
    jax.jit, static_argnames=("statics", "k_tries", "interpret")
)
def _run(seed, comps, lp, statics, k_tries, interpret):
    from .pallas_intersect import cast_to_vma

    b = comps[0].shape[0]
    vma = vma_union(seed, *comps, lp)
    seed = cast_to_vma(seed, vma)
    lp = cast_to_vma(lp, vma)
    comps = tuple(cast_to_vma(c, vma) for c in comps)
    grid = (b // BLK,)
    ray_spec = pl.BlockSpec((BLK,), lambda i: (i,), memory_space=pltpu.VMEM)
    in_specs = (
        [pl.BlockSpec((1,), lambda i: (0,), memory_space=pltpu.SMEM)]
        + [ray_spec] * 13
        + [
            pl.BlockSpec(
                lp.shape, lambda i: (0, 0), memory_space=pltpu.VMEM
            )
        ]
    )
    out = pl.pallas_call(
        functools.partial(_kernel, statics, k_tries),
        grid=grid,
        in_specs=in_specs,
        out_specs=[ray_spec] * 5,
        out_shape=[
            jax.ShapeDtypeStruct((b,), jnp.float32, vma=vma)
            for _ in range(5)
        ],
        interpret=pltpu.InterpretParams() if interpret else False,
    )(seed, *comps, lp)
    return out


def sample_mixture_pallas(
    key: jax.Array,
    point: Vec3,
    n_geom: Vec3,
    n_shade: Vec3,
    v: Vec3,
    roughness: jnp.ndarray,
    scn: SceneArrays,
    statics: SceneStatics,
    need: jnp.ndarray,
    max_tries: int = 4,
):
    """Drop-in for ops.sampling.sample_mixture (different RNG stream)."""
    b = point.x.shape[0]
    pad = (-b) % BLK
    comps = [
        point.x, point.y, point.z,
        n_geom.x, n_geom.y, n_geom.z,
        n_shade.x, n_shade.y, n_shade.z,
        v.x, v.y, v.z,
        roughness,
    ]
    if pad:
        comps = [jnp.pad(c, (0, pad)) for c in comps]
    kd = jax.random.key_data(key).astype(jnp.uint32)
    seed = (kd[0] ^ (kd[1] * jnp.uint32(40503))).astype(jnp.int32)[None]
    interpret = jax.default_backend() != "tpu"
    lx, ly, lz, pdf, okf = _run(
        seed, tuple(comps), scn.light_packed, statics, max_tries, interpret
    )
    l = Vec3(lx[:b], ly[:b], lz[:b])
    return l, pdf[:b], (okf[:b] > 0.5) & need
