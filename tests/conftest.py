"""Test env: force CPU with an 8-device virtual mesh.

This is the standard way to exercise jax.sharding/shard_map code without TPU
hardware (SURVEY.md section 4). Bench/production runs use the real chip.

Note: this image's sitecustomize registers the axon TPU plugin in every
python process and forces JAX_PLATFORMS=axon, so the env var alone is not
enough -- we must update jax.config after import (before any backend use).
"""

import os

import jax

if os.environ.get("RT_TEST_TPU"):
    # run the TPU-gated subset on real hardware:
    #   RT_TEST_TPU=1 pytest tests/test_pallas_sampler.py
    pass
else:
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()
    jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)


SCENES = os.environ.get("RT_SCENES_DIR", "/root/reference/scenes")


def scene_path(name: str) -> str:
    return os.path.join(SCENES, name)


@pytest.fixture(scope="session")
def scenes_dir():
    if not os.path.isdir(SCENES):
        pytest.skip("course scene fixtures not available")
    return SCENES
