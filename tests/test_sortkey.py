"""RAYFINDER_SORT_KEY=dir (hit-cluster x direction-bin sort key) and the
SORT_EVERY composite bodies must reproduce the wavefront regen result like
the tri-key sorted loop does."""

import pytest

import numpy as np
import jax.numpy as jnp

from rayfinder_tpu.render.camera import create_camera
from rayfinder_tpu.render.pathtracer import accumulate_samples_regen
from rayfinder_tpu.render.rng import blue_noise_tile
from rayfinder_tpu.render.scene import build_device_scene
from rayfinder_tpu.scene.procedural import courtyard_scene
from rayfinder_tpu.sky.model import sky_state_from_ui


@pytest.mark.parametrize(
    "mode,sort_every", [("tri", 1), ("dir", 1), ("dir", 2), ("dir", 3)]
)
def test_alt_key_sorted_matches_wavefront(monkeypatch, mode, sort_every):
    monkeypatch.setenv("RAYFINDER_REGEN_SORT", "1")
    monkeypatch.setenv("RAYFINDER_SORT_KEY", mode)
    # SORT_EVERY>1 composes sorted + nosort bodies (incl. count_rays
    # wrapping); it must stay result-identical to the wavefront oracle
    # (ADVICE r4: previously untested).
    monkeypatch.setenv("RAYFINDER_SORT_EVERY", str(sort_every))
    flat, textures = courtyard_scene(8)
    scene = build_device_scene(flat, textures=textures)

    w, h, spp, nb = 36, 28, 2, 3
    cam = create_camera([-16.0, 5.0, 0.0], [12.0, 2.0, 0.0], 0.0, 1.0, 70.0,
                        w / h)
    sky = sky_state_from_ui(2.5, (0.3, 0.3, 0.3), 35.0, 25.0)
    tile = jnp.asarray(blue_noise_tile())
    kw = dict(width=w, height=h, num_bounces=nb, spp=spp, num_frames=spp)

    wave = accumulate_samples_regen(
        scene, sky, cam, tile, jnp.int32(0),
        jnp.zeros((w * h, 3), jnp.float32), engine="wavefront", **kw,
    )
    fused = accumulate_samples_regen(
        scene, sky, cam, tile, jnp.int32(0),
        jnp.zeros((w * h, 3), jnp.float32), engine="pallas",
        compact_floor=128, **kw,
    )
    np.testing.assert_allclose(
        np.asarray(fused), np.asarray(wave), rtol=2e-4, atol=1e-5
    )


@pytest.mark.parametrize("sweep_budget,sort_every", [(1, 1), (2, 1), (2, 2)])
def test_budget_capped_sweeps_match_wavefront(monkeypatch, sweep_budget,
                                              sort_every):
    """RAYFINDER_SWEEP_BUDGET=B: budget-interrupted lanes resume via the
    flag==3 carry (t, tri, done-super bitmask) across dispatches. Radiance
    must match the wavefront oracle within the sorted-loop budget, and the
    exact ray counters must not double-count resumed segments."""
    import rayfinder_tpu.ops.pallas_walk as pw

    monkeypatch.setenv("RAYFINDER_REGEN_SORT", "1")
    monkeypatch.setenv("RAYFINDER_SORT_KEY", "dir")
    monkeypatch.setenv("RAYFINDER_GROUPED", "1")
    monkeypatch.setenv("RAYFINDER_SORT_EVERY", str(sort_every))
    flat, textures = courtyard_scene(8)
    scene = build_device_scene(flat, textures=textures)

    w, h, spp, nb = 36, 28, 2, 3
    cam = create_camera([-16.0, 5.0, 0.0], [12.0, 2.0, 0.0], 0.0, 1.0, 70.0,
                        w / h)
    sky = sky_state_from_ui(2.5, (0.3, 0.3, 0.3), 35.0, 25.0)
    tile = jnp.asarray(blue_noise_tile())
    kw = dict(width=w, height=h, num_bounces=nb, spp=spp, num_frames=spp)

    wave, wave_rays = accumulate_samples_regen(
        scene, sky, cam, tile, jnp.int32(0),
        jnp.zeros((w * h, 3), jnp.float32), engine="wavefront",
        count_rays=True, **kw,
    )
    monkeypatch.setattr(pw, "_SWEEP_BUDGET", sweep_budget)
    fused, rays = accumulate_samples_regen(
        scene, sky, cam, tile, jnp.int32(0),
        jnp.zeros((w * h, 3), jnp.float32), engine="pallas",
        compact_floor=128, count_rays=True, **kw,
    )
    monkeypatch.setattr(pw, "_SWEEP_BUDGET", 0)
    np.testing.assert_allclose(
        np.asarray(fused), np.asarray(wave), rtol=2e-4, atol=1e-5
    )
    np.testing.assert_array_equal(np.asarray(rays), np.asarray(wave_rays))
