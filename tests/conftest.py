"""Test configuration: run everything on a virtual 8-device CPU mesh.

Sharding/multi-chip tests need multiple devices; unit tests want fast,
deterministic CPU execution. Set platform flags before jax is imported
anywhere.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# The container's axon sitecustomize force-registers the TPU backend and sets
# jax_platforms explicitly, overriding the env var — override it back.
import jax

jax.config.update("jax_platforms", "cpu")

import pathlib

import numpy as np
import pytest

DUCK_GLB = pathlib.Path("/root/reference/assets/Duck.glb")


@pytest.fixture(scope="session")
def duck_scene():
    from rayfinder_tpu.scene import load_gltf

    return load_gltf(DUCK_GLB)


@pytest.fixture(scope="session")
def duck_flat(duck_scene):
    from rayfinder_tpu.scene import FlattenedScene

    return FlattenedScene.from_scene(duck_scene)


@pytest.fixture(scope="session")
def duck_bvh(duck_flat):
    from rayfinder_tpu.bvh import build_bvh

    return build_bvh(duck_flat.positions)


@pytest.fixture(scope="session")
def duck_device_scene(duck_scene, duck_flat, duck_bvh):
    from rayfinder_tpu.render.scene import build_device_scene

    return build_device_scene(
        duck_flat, bvh=duck_bvh, textures=duck_scene.base_color_textures
    )


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(1234)
