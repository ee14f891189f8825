"""rayfinder-tpu: a TPU-native wavefront path tracer in JAX/XLA/Pallas.

Rebuilds the capabilities of Nelarius/rayfinder (C++/WebGPU) TPU-first:
SoA ray batches, block-uniform cluster-sweep traversal, Pallas kernels on the
hot path, and `shard_map` tile/sample parallelism across device meshes.

Quick start::

    from rayfinder_tpu import load_scene, render_image, SamplingParams, create_camera
    from rayfinder_tpu.sky.model import sky_state_from_ui

    scene = load_scene("Duck.glb")            # .glb/.gltf or .pt
    camera = create_camera([2, 1.5, 2], [0.1, 0.8, 0], 0.0, 1.0, 70.0, 4 / 3)
    sky = sky_state_from_ui(1.0, (1, 1, 1), 30.0, 0.0)
    img = render_image(scene, sky, camera, width=800, height=600,
                       sampling=SamplingParams(128, 4))
"""

__version__ = "0.1.0"

import os as _os
import sys as _sys

if "jax" in _sys.modules:  # pragma: no cover - environment-dependent
    # The axon sitecustomize imports jax before any user code, so cache
    # env vars set by our entry points are read too late; configure the
    # persistent compile cache directly. The remote tpu_compile_helper
    # makes minute-long compiles register locally as <1s, which the
    # default min-compile-time threshold refuses to cache — threshold 0
    # is required for ANY entry to persist (measured 2026-08-20).
    _jax = _sys.modules["jax"]
    try:
        if not (_os.environ.get("JAX_COMPILATION_CACHE_DIR")
                or _jax.config.jax_compilation_cache_dir):
            _jax.config.update("jax_compilation_cache_dir",
                               _os.path.expanduser("~/.jax_cache"))
        # Respect a programmatic user override: only force the threshold
        # when it still holds jax's default (1.0s).
        if (not _os.environ.get("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS")
                and _jax.config.jax_persistent_cache_min_compile_time_secs
                == 1.0):
            _jax.config.update("jax_persistent_cache_min_compile_time_secs",
                               0.0)
    except Exception as _e:
        import logging as _logging

        _logging.getLogger(__name__).debug(
            "compile-cache shim skipped: %r", _e)


def __getattr__(name):
    # Lazy exports keep `import rayfinder_tpu` free of jax initialization.
    if name == "load_scene":
        from .render.scene import load_device_scene

        return load_device_scene
    if name in ("render_image", "render_image_tiled", "SamplingParams", "trace_radiance"):
        from .render import pathtracer

        return getattr(pathtracer, name)
    if name in ("create_camera", "Camera"):
        from .render import camera

        return getattr(camera, name)
    if name in ("Renderer", "RenderParameters", "Sky"):
        from .render import renderer

        return getattr(renderer, name)
    if name == "DeferredRenderer":
        from .render.deferred import DeferredRenderer

        return DeferredRenderer
    raise AttributeError(f"module 'rayfinder_tpu' has no attribute {name!r}")


def __dir__():
    return sorted(set(globals()) | set(__all__))


__all__ = [
    "load_scene",
    "render_image",
    "render_image_tiled",
    "SamplingParams",
    "trace_radiance",
    "create_camera",
    "Camera",
    "Renderer",
    "RenderParameters",
    "Sky",
    "DeferredRenderer",
]
