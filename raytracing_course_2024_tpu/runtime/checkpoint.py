"""Sample-accumulation checkpoint/resume.

The reference has none (a render is one shot; SURVEY.md section 5) -- but
the accumulator design gives it almost for free: radiance sums and sample
counts are the whole render state. A long 1024-spp frame renders in spp
chunks; after each chunk the (sum, count, next_chunk) state is written to an
.npz, and a restarted job resumes from the last completed chunk with the
identical deterministic sample stream (chunk index is folded into the key,
so resume == uninterrupted run, bit-for-bit).
"""

from __future__ import annotations

import logging
import os

import jax
import numpy as np

from .render import Renderer

log = logging.getLogger("rt_tpu")


def scene_fingerprint(renderer) -> str:
    """Stable hex digest of the scene content + engine config.

    Guards resume against the silent-blend failure mode (VERDICT r4 weak
    #6): two scenes at the same resolution/seed would otherwise average
    into one image. Hashes the numeric scene arrays (geometry, materials,
    lights), the camera, and the engine/backend choice -- everything that
    changes the sample stream or the radiance."""
    import hashlib

    h = hashlib.sha256()
    s = renderer.settings
    h.update(repr((
        s.width, s.height, s.ray_depth, tuple(s.bg_color),
        renderer.engine, renderer.backend,
    )).encode())
    cam = s.camera
    h.update(np.asarray([
        *cam.position, *cam.right, *cam.up, *cam.forward, cam.fov_x,
    ], np.float64).tobytes())
    for leaf in jax.tree_util.tree_leaves(renderer.arrays):
        h.update(np.asarray(leaf).tobytes())
    return h.hexdigest()[:32]


def render_with_checkpoints(
    renderer: Renderer,
    ckpt_path: str,
    total_spp: int | None = None,
    chunk_spp: int = 32,
    seed: int = 0,
) -> np.ndarray:
    """Mean radiance (H, W, 3), checkpointing after every spp chunk.

    Resumes from ``ckpt_path`` if it exists (validating shape + seed).
    """
    s = renderer.settings
    total_spp = total_spp or s.samples
    shape = (s.height, s.width, 3)

    fprint = scene_fingerprint(renderer)
    acc = np.zeros(shape, np.float64)
    done_spp = 0
    next_chunk = 0
    if os.path.exists(ckpt_path):
        with np.load(ckpt_path) as ck:
            ck_fp = str(ck["scene"]) if "scene" in ck.files else None
            if ck_fp is not None and ck_fp != fprint:
                raise ValueError(
                    f"checkpoint {ckpt_path} was written for a different "
                    f"scene/engine (fingerprint {ck_fp} != {fprint}); "
                    "refusing to blend two renders -- delete it to restart"
                )
            if tuple(ck["shape"]) == shape and int(ck["seed"]) == seed and int(
                ck["chunk_spp"]
            ) == chunk_spp:
                acc = ck["sum"]
                done_spp = int(ck["done_spp"])
                next_chunk = int(ck["next_chunk"])
                log.info("resuming from %s: %d/%d spp", ckpt_path, done_spp, total_spp)
            else:
                log.warning("checkpoint %s incompatible; starting over", ckpt_path)

    while done_spp < total_spp:
        this_chunk = min(chunk_spp, total_spp - done_spp)
        # chunk index folded into the seed: the sample stream is identical
        # whether or not the job was interrupted
        rad = renderer.render_radiance(
            seed=seed * 1_000_003 + next_chunk, samples=this_chunk
        )
        acc += rad.astype(np.float64) * this_chunk
        done_spp += this_chunk
        next_chunk += 1
        tmp = ckpt_path + ".tmp.npz"
        np.savez(
            tmp,
            sum=acc,
            done_spp=done_spp,
            next_chunk=next_chunk,
            shape=np.array(shape),
            seed=seed,
            chunk_spp=chunk_spp,
            scene=fprint,
        )
        os.replace(tmp, ckpt_path)
        log.info("checkpoint: %d/%d spp", done_spp, total_spp)

    return (acc / done_spp).astype(np.float32)
