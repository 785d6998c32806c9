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


@pytest.mark.slow
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


# --- analytic-primitive + delta-material megakernel (round 4) --------------

MIXED_SCENE = """
DIMENSIONS 32 24
RAY_DEPTH 4
SAMPLES 4
BG_COLOR 0.1 0.15 0.2
CAMERA_POSITION 0 0 9
CAMERA_RIGHT 1 0 0
CAMERA_UP 0 1 0
CAMERA_FORWARD 0 0 -1
CAMERA_FOV_X 1.2

NEW_PRIMITIVE
PLANE 0 1 0
POSITION 0 -3 0
COLOR 0.7 0.7 0.7

NEW_PRIMITIVE
PLANE 1 0 0
POSITION -4 0 0
ROTATION 0 0 0.1305262 0.9914449
COLOR 0.8 0.3 0.3

NEW_PRIMITIVE
BOX 1 1.5 1
POSITION -1.5 -1.5 0
ROTATION 0 0.3826834 0 0.9238795
COLOR 0.3 0.8 0.3
METALLIC

NEW_PRIMITIVE
ELLIPSOID 1.2 0.8 1.2
POSITION 1.8 -1.8 1
COLOR 0.9 0.9 0.9
DIELECTRIC
IOR 1.5

NEW_PRIMITIVE
BOX 1.2 0.1 1.2
POSITION 0 2.8 0
EMISSION 4 4 4

NEW_PRIMITIVE
TRIANGLE -3 -2 2  -1 -2 3  -2 0 2.5
COLOR 0.4 0.4 0.9
"""


def _mixed():
    from raytracing_course_2024_tpu.scene import parse_text_scene

    desc = parse_text_scene(MIXED_SCENE)
    arrays, statics = build_scene_arrays(desc)
    return desc, jax.tree.map(
        lambda x: jnp.asarray(x) if x is not None else None, arrays
    ), statics


def test_mixed_scene_eligible_and_spec():
    """Analytic primitives + rotations + delta materials are in-scope since
    round 4: mega_spec carries one static (kind, rotated, mkind) per finite
    prim then per real plane."""
    from raytracing_course_2024_tpu.scene.types import (
        BOX, DIELECTRIC, ELLIPSOID, MIRROR, TRI,
    )

    desc, arrays, statics = _mixed()
    assert statics.any_delta and statics.any_nontri
    assert megakernel_eligible(statics, arrays)
    kinds = [k for k, _, _ in statics.mega_spec]
    mkinds = [m for _, _, m in statics.mega_spec]
    rots = [r for _, r, m in statics.mega_spec]
    # 4 finite prims (box, ellipsoid, emissive box, triangle) then 2 planes
    assert kinds.count(3) == 2  # planes last
    assert kinds[-1] == 3 and kinds[-2] == 3
    assert BOX in kinds and ELLIPSOID in kinds and TRI in kinds
    assert MIRROR in mkinds and DIELECTRIC in mkinds
    assert any(rots)  # rotated box + rotated plane


def test_mixed_bounce_matches_xla_stages():
    """One interpret-mode kernel bounce on the mixed scene: emission
    accumulation, hit points, and normals must match the XLA
    intersect/detail stages exactly (RNG-independent); mirror lanes must
    apply the deterministic delta rule (reflect + color throughput)."""
    from raytracing_course_2024_tpu.ops.scene_intersect import (
        nearest_hit_dense,
        surface_detail,
    )
    from raytracing_course_2024_tpu.ops.vec import reflect
    from raytracing_course_2024_tpu.scene.types import DIELECTRIC, MIRROR

    desc, arrays, statics = _mixed()
    cam = camera_arrays(desc.settings.camera)
    w, h = 32, 24
    b = w * h
    idx = jnp.arange(b, dtype=jnp.int32)
    key = jax.random.PRNGKey(2)
    ro, rd = generate_rays(cam, idx % w, idx // w, w, h, key)
    ones = jnp.ones((b,))
    zeros = jnp.zeros((b,))
    ro2, rd2, thr, rad, alive2 = bounce_pallas(
        key, ro, rd, Vec3(ones, ones, ones), Vec3(zeros, zeros, zeros),
        ones > 0.0, arrays, statics, tuple(desc.settings.bg_color),
    )
    hit = nearest_hit_dense(ro, rd, arrays, statics)
    surf = surface_detail(ro, rd, hit, arrays, statics)

    # emission/background accumulation matches the XLA collect stage
    import numpy as _np

    want = _np.where(
        _np.asarray(hit.valid),
        _np.asarray(surf.emission.x),
        desc.settings.bg_color[0],
    )
    assert _np.allclose(_np.asarray(rad.x), want, atol=1e-5)

    mk = _np.asarray(surf.mkind)
    valid = _np.asarray(hit.valid)
    is_mirror = valid & (mk == MIRROR)
    is_diel = valid & (mk == DIELECTRIC)
    assert is_mirror.sum() > 10 and is_diel.sum() > 10  # scene exercises both

    # hit points agree for every hit lane (delta rays restart from the
    # backed-off point too, except dielectric transmission)
    for c, sc in ((ro2.x, surf.point.x), (ro2.y, surf.point.y)):
        got, wantp = _np.asarray(c), _np.asarray(sc)
        sel = valid & ~is_diel
        assert _np.allclose(got[sel], wantp[sel], atol=1e-4)

    # mirror lanes: deterministic reflect + color throughput
    lm = reflect(-rd, surf.n_geom)
    for got, wantd in ((rd2.x, lm.x), (rd2.y, lm.y), (rd2.z, lm.z)):
        assert _np.allclose(
            _np.asarray(got)[is_mirror], _np.asarray(wantd)[is_mirror],
            atol=1e-5,
        )
    assert _np.allclose(
        _np.asarray(thr.x)[is_mirror], _np.asarray(surf.color.x)[is_mirror],
        atol=1e-5,
    )
    # mirror/dielectric lanes always survive the bounce
    a2 = _np.asarray(alive2)
    assert a2[is_mirror].all() and a2[is_diel].all()

    # normals: kernel's geometric normal equals the XLA detail stage's
    # (checked through the mirror direction above for mirror lanes; check
    # diffuse lanes via the hit point + emission already; dielectric lanes
    # must scatter into either the reflect or the refract direction with
    # the matching origin/throughput rule)
    cos_i = _np.clip(_np.asarray((-rd).dot(surf.n_geom)), 0.0, 1.0)
    ioutr = _np.asarray(surf.is_outer)
    iorv = _np.asarray(surf.ior)
    eta = _np.where(ioutr, 1.0 / iorv, iorv)
    sin2 = eta * eta * _np.maximum(0.0, 1.0 - cos_i * cos_i)
    cos_t = _np.sqrt(_np.maximum(0.0, 1.0 - sin2))
    rdn = _np.stack([_np.asarray(rd.x), _np.asarray(rd.y), _np.asarray(rd.z)], 1)
    nn = _np.stack(
        [_np.asarray(surf.n_geom.x), _np.asarray(surf.n_geom.y),
         _np.asarray(surf.n_geom.z)], 1,
    )
    refr = rdn * eta[:, None] + nn * (eta * cos_i - cos_t)[:, None]
    refr = refr / _np.maximum(
        _np.linalg.norm(refr, axis=1, keepdims=True), 1e-20
    )
    refl = _np.stack([_np.asarray(lm.x), _np.asarray(lm.y), _np.asarray(lm.z)], 1)
    got_d = _np.stack([_np.asarray(rd2.x), _np.asarray(rd2.y), _np.asarray(rd2.z)], 1)
    d_refl = _np.linalg.norm(got_d - refl, axis=1)
    d_refr = _np.linalg.norm(got_d - refr, axis=1)
    assert (_np.minimum(d_refl, d_refr)[is_diel] < 1e-4).all()
    # transmitted lanes restart past the surface; reflected ones at the
    # backed-off point
    went_refr = is_diel & (d_refr < d_refl)
    pb = _np.asarray((ro + rd * (surf.t + 1e-4)).x)
    assert _np.allclose(_np.asarray(ro2.x)[went_refr], pb[went_refr], atol=1e-4)
    # refraction into the object multiplies throughput by color
    into = went_refr & ioutr
    if into.sum():
        assert _np.allclose(
            _np.asarray(thr.y)[into], _np.asarray(surf.color.y)[into],
            atol=1e-5,
        )


PLANES_ONLY_SCENE = """
DIMENSIONS 32 24
RAY_DEPTH 3
SAMPLES 4
BG_COLOR 0.2 0.3 0.5
CAMERA_POSITION 0 1 6
CAMERA_RIGHT 1 0 0
CAMERA_UP 0 1 0
CAMERA_FORWARD 0 0 -1
CAMERA_FOV_X 1.2

NEW_PRIMITIVE
PLANE 0 1 0
POSITION 0 -2 0
COLOR 0.7 0.6 0.5

NEW_PRIMITIVE
PLANE 0 0 1
POSITION 0 0 -5
ROTATION 0 0.0871557 0 0.9961947
COLOR 0.3 0.5 0.8
"""


def test_planes_only_scene_megakernel_alignment():
    """Zero finite primitives: build_scene_arrays pads prim arrays to one
    row, which mega_spec omits -- the geo table must slice it away or every
    plane entry reads the padding column's geometry (advisor round-4 high
    finding). Pin the kernel's intersect/emission stages against the XLA
    pipeline on a planes-only scene."""
    from raytracing_course_2024_tpu.ops.pallas_bounce import build_geo_rows
    from raytracing_course_2024_tpu.ops.scene_intersect import (
        nearest_hit_dense,
        surface_detail,
    )
    from raytracing_course_2024_tpu.scene import parse_text_scene

    desc = parse_text_scene(PLANES_ONLY_SCENE)
    arrays, statics = build_scene_arrays(desc)
    arrays = jax.tree.map(
        lambda x: jnp.asarray(x) if x is not None else None, arrays
    )
    assert statics.num_prims == 0 and statics.num_planes == 2
    assert megakernel_eligible(statics, arrays)
    geo = build_geo_rows(arrays, statics)
    assert geo.shape[1] == len(statics.mega_spec) == 2

    cam = camera_arrays(desc.settings.camera)
    w, h = 32, 24
    b = w * h
    idx = jnp.arange(b, dtype=jnp.int32)
    key = jax.random.PRNGKey(3)
    ro, rd = generate_rays(cam, idx % w, idx // w, w, h, key)
    ones = jnp.ones((b,))
    zeros = jnp.zeros((b,))
    ro2, rd2, thr, rad, alive2 = bounce_pallas(
        key, ro, rd, Vec3(ones, ones, ones), Vec3(zeros, zeros, zeros),
        ones > 0.0, arrays, statics, tuple(desc.settings.bg_color),
    )
    hit = nearest_hit_dense(ro, rd, arrays, statics)
    surf = surface_detail(ro, rd, hit, arrays, statics)
    valid = np.asarray(hit.valid)
    assert valid.sum() > 100  # both planes actually hit
    want = np.where(valid, np.asarray(surf.emission.x), desc.settings.bg_color[0])
    assert np.allclose(np.asarray(rad.x), want, atol=1e-5)
    for c, sc in ((ro2.x, surf.point.x), (ro2.z, surf.point.z)):
        assert np.allclose(np.asarray(c)[valid], np.asarray(sc)[valid], atol=1e-4)


def test_final_only_epilogue_matches_collect():
    """final_only (the fused integrator epilogue) reproduces the XLA
    _collect_hit radiance exactly, on both the all-triangle Cornell box and
    the mixed analytic scene."""
    from raytracing_course_2024_tpu.integrator.path import (
        _collect_hit,
        _PathState,
    )

    for scene_fn in (_cornell, _mixed):
        desc, arrays, statics = scene_fn()
        cam = camera_arrays(desc.settings.camera)
        w, h = desc.settings.width, desc.settings.height
        b = w * h
        idx = jnp.arange(b, dtype=jnp.int32)
        key = jax.random.PRNGKey(5)
        ro, rd = generate_rays(cam, idx % w, idx // w, w, h, key)
        ones = jnp.ones((b,))
        halves = jnp.full((b,), 0.5)
        zeros = jnp.zeros((b,))
        alive = (idx % 3) != 0  # some dead lanes must stay untouched
        cfg = TraceConfig(
            ray_depth=desc.settings.ray_depth,
            bg_color=tuple(desc.settings.bg_color),
        )
        st = _PathState(
            ro=ro, rd=rd, throughput=Vec3(halves, ones, halves),
            radiance=Vec3(zeros, zeros, zeros), alive=alive,
        )
        want, _, _ = _collect_hit(st, arrays, statics, cfg)
        _, _, _, rad, _ = bounce_pallas(
            key, ro, rd, st.throughput, st.radiance, alive, arrays,
            statics, tuple(desc.settings.bg_color), final_only=True,
        )
        assert np.allclose(
            np.asarray(rad.x), np.asarray(want.radiance.x), atol=1e-5
        )
        assert np.allclose(
            np.asarray(rad.z), np.asarray(want.radiance.z), atol=1e-5
        )


# --- camera-fused primary bounce (round 4, batch engine) -------------------


def _kernel_first_draws(key, n_draws: int):
    """First ``n_draws`` uniforms of the megakernel PRNG stream for grid
    block 0, using the exact seeding expression of the production kernels
    (pallas_bounce seed derivation + prng_seed mix)."""
    import functools

    import jax.experimental.pallas as pl
    import jax.experimental.pallas.tpu as pltpu

    from raytracing_course_2024_tpu.ops.pallas_bounce import BLK
    from raytracing_course_2024_tpu.ops.pallas_sampling import make_unif

    def kern(seed_ref, *outs):
        pltpu.prng_seed(
            seed_ref[0] + pl.program_id(0) * jnp.int32(-1640531527)
        )
        unif = make_unif(BLK)
        for o in outs:
            o[:] = unif()

    kd = jax.random.key_data(key).astype(jnp.uint32)
    seed = (kd[0] ^ (kd[1] * jnp.uint32(40503))).astype(jnp.int32)[None]
    ray_spec = pl.BlockSpec((BLK,), lambda i: (i,), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kern,
        grid=(1,),
        in_specs=[pl.BlockSpec((1,), lambda i: (0,), memory_space=pltpu.SMEM)],
        out_specs=[ray_spec] * n_draws,
        out_shape=[
            jax.ShapeDtypeStruct((BLK,), jnp.float32) for _ in range(n_draws)
        ],
        interpret=(
            pltpu.InterpretParams()
            if jax.default_backend() != "tpu"
            else False
        ),
    )(seed)


@pytest.mark.slow
def test_primary_bounce_camera_fusion_interpret():
    """Camera-fused bounce 0 (primary_bounce_pallas): extract the kernel
    PRNG's first two draws with a probe kernel, rebuild the exact jittered
    camera ray via the XLA generate_rays_u, and pin the RNG-independent
    stages -- NDC camera math, hit points, emission accumulation -- against
    the XLA intersect/detail pipeline. One grid block (b == BLK) so the
    probe's stream is the kernel's."""
    from raytracing_course_2024_tpu.ops.camera import generate_rays_u
    from raytracing_course_2024_tpu.ops.pallas_bounce import (
        BLK,
        primary_bounce_pallas,
    )
    from raytracing_course_2024_tpu.ops.scene_intersect import (
        nearest_hit_dense,
        surface_detail,
    )

    w, h = 128, 64
    assert w * h == BLK
    desc, arrays, statics = _cornell(w, h, 2)
    cam = camera_arrays(desc.settings.camera)
    b = w * h
    idx = jnp.arange(b, dtype=jnp.int32)
    px, py = idx % w, idx // w
    key = jax.random.PRNGKey(3)

    ro2, rd2, thr, rad, alive2 = primary_bounce_pallas(
        key, px, py, cam, arrays, statics, (0.0, 0.0, 0.0), 4, w, h
    )

    # the kernel's camera jitter is draws 0 and 1 of its PRNG stream
    u0, u1 = _kernel_first_draws(key, 2)
    ro_w, rd_w = generate_rays_u(cam, px, py, w, h, u0, u1)
    hit = nearest_hit_dense(ro_w, rd_w, arrays, statics)
    surf = surface_detail(ro_w, rd_w, hit, arrays, statics)

    valid = np.asarray(hit.valid)
    assert valid.mean() > 0.9  # nearly every primary ray hits the box
    # emission/background accumulation through the fused camera ray matches
    # XLA exactly (bg here is 0, so missing lanes accumulate 0)
    for got, want in ((rad.x, surf.emission.x), (rad.z, surf.emission.z)):
        assert np.allclose(
            np.asarray(got), np.where(valid, np.asarray(want), 0.0),
            atol=1e-5,
        )
    # hit points (= next origins; Cornell is all-diffuse) match -> pins the
    # NDC math, the basis projection, and the normalize inside the kernel
    a2 = np.asarray(alive2)
    assert a2.mean() > 0.5
    for got, want in ((ro2.x, surf.point.x), (ro2.y, surf.point.y),
                      (ro2.z, surf.point.z)):
        assert np.allclose(
            np.asarray(got)[a2], np.asarray(want)[a2], atol=1e-4
        )
    # continuation directions are unit
    nrm = np.asarray(rd2.dot(rd2))
    assert np.allclose(nrm[a2], 1.0, atol=1e-4)
    # lanes killed by sampling carry zero throughput
    assert np.all(np.asarray(thr.x)[~a2] == 0.0)


@pytest.mark.slow
def test_trace_paths_mega_primary_plumbing():
    """Full camera-fused sample (_trace_paths_mega_primary) in interpret
    mode: shapes, finiteness, and the path-vertex accounting bounds
    (every lane traces the camera bounce; at most ray_depth levels)."""
    from raytracing_course_2024_tpu.integrator.path import (
        _trace_paths_mega_primary,
    )
    from raytracing_course_2024_tpu.ops.pallas_bounce import build_geo_rows

    desc, arrays, statics = _cornell(64, 36, 2)
    cam = camera_arrays(desc.settings.camera)
    b = 64 * 36
    idx = jnp.arange(b, dtype=jnp.int32)
    cfg = TraceConfig(ray_depth=4, bg_color=(0.0, 0.0, 0.0))
    geo = build_geo_rows(arrays, statics)
    rad, rays = _trace_paths_mega_primary(
        jax.random.PRNGKey(7), idx % 64, idx // 64, cam, arrays, statics,
        cfg, 64, 36, geo,
    )
    r = np.asarray(rays)
    assert r.shape == (b,)
    assert (r >= 1.0).all() and (r <= cfg.ray_depth).all()
    assert (r > 1.0).any()  # some paths survived past the camera bounce
    for c in (rad.x, rad.y, rad.z):
        assert np.isfinite(np.asarray(c)).all()
        assert (np.asarray(c) >= 0.0).all()


@pytest.mark.skipif(
    not (
        os.environ.get("RT_TEST_MEGAKERNEL") or os.environ.get("RT_TEST_TPU")
    ),
    reason="needs a real TPU (RT_TEST_TPU=1)",
)
def test_megakernel_matches_xla_image_mixed_tpu():
    """Full-render statistical parity on an analytic + delta scene
    (practice3_4: mirror-free but dielectric ellipsoid, planes, ellipsoid
    light): megakernel vs XLA bounce at 64 spp within MC noise. Pins the
    round-4 kernel scope extension on hardware."""
    w, h, spp = 128, 128, 64
    desc = load_scene(scene_path("practice3_4.txt"), w, h, spp)
    arrays, statics = build_scene_arrays(desc)
    arrays = jax.tree.map(
        lambda x: jnp.asarray(x) if x is not None else None, arrays
    )
    assert statics.any_delta and megakernel_eligible(statics, arrays)
    cam = camera_arrays(desc.settings.camera)
    cfg = TraceConfig(
        ray_depth=desc.settings.ray_depth,
        bg_color=tuple(desc.settings.bg_color),
    )
    b = w * h
    idx = jnp.arange(b, dtype=jnp.int32)
    os.environ["RT_MEGAKERNEL"] = "1"
    try:
        mega = np.asarray(
            render_pixels(
                jax.random.PRNGKey(0), idx % w, idx // w, cam, arrays,
                statics, cfg, w, h, spp,
            )
        )
        os.environ["RT_MEGAKERNEL"] = "0"
        xla = np.asarray(
            render_pixels(
                jax.random.PRNGKey(1), idx % w, idx // w, cam, arrays,
                statics, cfg, w, h, spp,
            )
        )
    finally:
        os.environ.pop("RT_MEGAKERNEL", None)
    mm, xm = mega.mean(axis=1), xla.mean(axis=1)
    rel = np.abs(mm - xm) / np.maximum(xm, 1e-9)
    assert (rel < 0.03).all(), (mm, xm)
    tm = mega.reshape(h // 16, 16, w // 16, 16, 3).mean(axis=(1, 3))
    tx = xla.reshape(h // 16, 16, w // 16, 16, 3).mean(axis=(1, 3))
    assert np.abs(tm - tx).max() / max(xm.max(), 1e-9) < 0.15
