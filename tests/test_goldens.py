"""Golden-image regression tests.

The reference validates its renderers by eye against showcase images
(SURVEY.md §4); here the three visual tools are pinned against committed
goldens with an RMSE budget (regenerate with `python tests/goldens/bake.py`
if behavior intentionally changes, and review the diffs visually).
"""

import pathlib

import numpy as np
import pytest

from rayfinder_tpu.utils.image import read_png, rmse

GOLDENS = pathlib.Path(__file__).parent / "goldens"


def _golden(name):
    return read_png(GOLDENS / name).astype(np.float32) / 255.0


def test_duck_render_matches_golden(duck_device_scene):
    """Duck 64x48 @ 2spp/2bounce, reference engine, deterministic noise."""
    from rayfinder_tpu.render.camera import create_camera
    from rayfinder_tpu.render.pathtracer import SamplingParams, render_image
    from rayfinder_tpu.sky.model import sky_state_from_ui

    cam = create_camera([2.0, 1.5, 2.0], [0.1, 0.8, 0.0], 0.0, 1.0, 70.0, 64 / 48)
    sky = sky_state_from_ui(1.0, (1, 1, 1), 30.0, 0.0)
    img = render_image(
        duck_device_scene,
        sky,
        cam,
        width=64,
        height=48,
        sampling=SamplingParams(2, 2),
        exposure=0.25,
        engine="reference",
    )
    assert rmse(img, _golden("duck_64x48_2spp.png")) < 5e-3


def test_duck_render_pallas_close_to_golden(duck_device_scene):
    """The pallas engine must land within a hair of the reference engine
    (identical sampling; only last-ulp t differences)."""
    from rayfinder_tpu.render.camera import create_camera
    from rayfinder_tpu.render.pathtracer import SamplingParams, render_image
    from rayfinder_tpu.sky.model import sky_state_from_ui

    cam = create_camera([2.0, 1.5, 2.0], [0.1, 0.8, 0.0], 0.0, 1.0, 70.0, 64 / 48)
    sky = sky_state_from_ui(1.0, (1, 1, 1), 30.0, 0.0)
    img = render_image(
        duck_device_scene,
        sky,
        cam,
        width=64,
        height=48,
        sampling=SamplingParams(2, 2),
        exposure=0.25,
        engine="pallas",
    )
    assert rmse(img, _golden("duck_64x48_2spp.png")) < 1e-2


def test_sky_dome_matches_golden():
    from rayfinder_tpu.tools.sky_demo import render_sky_dome

    dome = render_sky_dome(size=64)
    assert rmse(dome, _golden("sky_dome_64.png")) < 5e-3


def test_bvh_heatmap_matches_golden():
    """Node-visit counts are integers: the heatmap must match exactly."""
    from rayfinder_tpu.tools.bvh_visualizer import visualize

    heat = visualize("/root/reference/assets/Duck.glb", width=64, height=48)
    np.testing.assert_array_equal(heat, read_png(GOLDENS / "bvh_heatmap_64x48.png"))


def test_blue_noise_tool_roundtrip(tmp_path):
    """PNG -> npz baking (the Rust codegen analog) round-trips the tile."""
    from rayfinder_tpu.render.rng import blue_noise_tile
    from rayfinder_tpu.tools.blue_noise_tool import bake_png
    from rayfinder_tpu.utils.image import write_png

    tile = (blue_noise_tile() * 255.0).astype(np.uint8)  # (128, 128, 2)
    rgba = np.concatenate(
        [tile, np.zeros_like(tile[..., :1]), np.full_like(tile[..., :1], 255)], axis=-1
    )
    png = tmp_path / "noise.png"
    write_png(png, rgba)
    out = tmp_path / "noise.npz"
    bake_png(png, out)
    with np.load(out) as data:
        np.testing.assert_array_equal(data["tile"], tile)


def test_textured_courtyard_matches_golden():
    """The multi-texture courtyard (14 mixed-size PNG-decoded images through
    the packed atlas) pinned at 64x48 @ 2spp/3bounce, reference engine.
    Bake: python tests/goldens/bake.py."""
    from rayfinder_tpu.render.camera import create_camera
    from rayfinder_tpu.render.pathtracer import SamplingParams, render_image
    from rayfinder_tpu.render.scene import build_device_scene
    from rayfinder_tpu.scene.procedural import courtyard_scene
    from rayfinder_tpu.sky.model import sky_state_from_ui

    flat, textures = courtyard_scene(4, textured=True)
    scene = build_device_scene(flat, textures=textures)
    cam = create_camera([-16.0, 5.0, 0.0], [12.0, 2.0, 0.0], 0.0, 1.0, 70.0, 64 / 48)
    sky = sky_state_from_ui(2.5, (0.3, 0.3, 0.3), 35.0, 25.0)
    img = render_image(
        scene, sky, cam, width=64, height=48,
        sampling=SamplingParams(2, 3), exposure=1.0, engine="reference",
    )
    assert rmse(img, _golden("courtyard_textured_64x48_2spp.png")) < 5e-3


def test_deferred_renderer_matches_golden(duck_device_scene):
    """DeferredRenderer output pinned: 3 TAA frames (gbuffer->lighting->
    resolve) and the debug triptych, Duck 64x48, wavefront engine."""
    from rayfinder_tpu.render.camera import create_camera
    from rayfinder_tpu.render.deferred import DeferredRenderer
    from rayfinder_tpu.sky.model import sky_state_from_ui

    cam = create_camera([2.0, 1.5, 2.0], [0.1, 0.8, 0.0], 0.0, 1.0, 70.0, 64 / 48)
    sky = sky_state_from_ui(1.0, (1, 1, 1), 30.0, 0.0)
    dr = DeferredRenderer(duck_device_scene, 64, 48, engine="wavefront")
    for _ in range(3):
        out = dr.render(cam, sky, exposure=0.25)
    assert rmse(out, _golden("duck_deferred_64x48_f3.png")) < 5e-3
    debug = dr.render_debug(cam)
    assert rmse(debug, _golden("duck_deferred_debug_64x48.png")) < 5e-3


def test_grouped_sweep_golden():
    """The GROUPED sweeps (the production big-scene path behind the
    primary courtyard metric) must reproduce the pinned accepted-hit set
    EXACTLY — red if the grouped semantics change at all, even when
    grouped-vs-flat agreement would still pass because both moved."""
    import jax.numpy as jnp

    from rayfinder_tpu.ops import pallas_walk as pw
    from rayfinder_tpu.render.scene import build_device_scene
    from rayfinder_tpu.scene.procedural import courtyard_scene

    data = np.load(GOLDENS / "grouped_courtyard8.npz")
    flat, textures = courtyard_scene(8)
    scene = build_device_scene(flat, textures=textures)
    assert scene.cluster_tris.shape[0] > pw.SUPER_G

    t_max = jnp.float32(1e4)
    o = jnp.asarray(data["origins"])
    d = jnp.asarray(data["directions"])
    import os

    os.environ["RAYFINDER_GROUPED"] = "1"
    try:
        (t_out, tri_out), n, _ = pw._common_call(
            scene, o, d, t_max, pw._make_closest_kernel,
            (jnp.float32, jnp.int32),
        )
        (occ,), _, _ = pw._common_call(
            scene, o, d, t_max, pw._make_any_kernel, (jnp.int32,)
        )
    finally:
        del os.environ["RAYFINDER_GROUPED"]

    np.testing.assert_array_equal(
        np.asarray(tri_out).reshape(-1)[:n], data["tri"]
    )
    np.testing.assert_allclose(
        np.asarray(t_out).reshape(-1)[:n], data["t"], rtol=0, atol=0
    )
    np.testing.assert_array_equal(
        np.asarray(occ).reshape(-1)[:n], data["occ"]
    )


def _assert_sweep_matches(scene, data, env=None):
    import os

    import jax.numpy as jnp

    from rayfinder_tpu.ops import pallas_walk as pw

    t_max = jnp.float32(1e4)
    o = jnp.asarray(data["origins"])
    d = jnp.asarray(data["directions"])
    saved = {k: os.environ.get(k) for k in (env or {})}
    os.environ.update(env or {})
    try:
        (t_out, tri_out), n, _ = pw._common_call(
            scene, o, d, t_max, pw._make_closest_kernel,
            (jnp.float32, jnp.int32),
        )
        (occ,), _, _ = pw._common_call(
            scene, o, d, t_max, pw._make_any_kernel, (jnp.int32,)
        )
    finally:
        for k, v in saved.items():
            if v is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = v
    np.testing.assert_array_equal(
        np.asarray(tri_out).reshape(-1)[:n], data["tri"]
    )
    np.testing.assert_allclose(
        np.asarray(t_out).reshape(-1)[:n], data["t"], rtol=0, atol=0
    )
    np.testing.assert_array_equal(
        np.asarray(occ).reshape(-1)[:n], data["occ"]
    )


def test_flat_sweep_golden_single_super(duck_device_scene):
    """The FLAT sweeps' single-super fast path (the small-scene production
    path behind the driver Duck bench) must reproduce the pinned
    accepted-hit set EXACTLY — red if the flat semantics change even when
    flat-vs-wavefront agreement would still pass because both moved."""
    from rayfinder_tpu.ops import pallas_walk as pw

    assert pw._grouped_mode(duck_device_scene.cluster_tris.shape[0]) is False
    data = np.load(GOLDENS / "flat_duck.npz")
    _assert_sweep_matches(duck_device_scene, data)


def test_flat_sweep_golden_multi_super():
    """The FLAT multi-super walk (super selection loop + per-visit DMA)
    pinned exactly on a courtyard-scale scene (RAYFINDER_GROUPED=0)."""
    from rayfinder_tpu.ops import pallas_walk as pw
    from rayfinder_tpu.render.scene import build_device_scene
    from rayfinder_tpu.scene.procedural import courtyard_scene

    flat, textures = courtyard_scene(8)
    scene = build_device_scene(flat, textures=textures)
    assert scene.cluster_tris.shape[0] > pw.SUPER
    data = np.load(GOLDENS / "flat_courtyard8.npz")
    _assert_sweep_matches(scene, data, env={"RAYFINDER_GROUPED": "0"})


def test_flat_sweep_golden_pipelined(duck_device_scene, monkeypatch):
    """RAYFINDER_PIPE_SEL=1 (stale-bound pipelined selection) must be
    hit-for-hit identical to the default sweep: accepts are guarded by the
    at-test-time bound, so pipelining may only waste a guarded iteration."""
    from rayfinder_tpu.ops import pallas_walk as pw

    monkeypatch.setattr(pw, "_PIPE_SEL", True)
    data = np.load(GOLDENS / "flat_duck.npz")
    _assert_sweep_matches(duck_device_scene, data)
