"""Persistent path kernel (ops/pallas_regen): in-kernel sky + regeneration.

The fused pallas regen path must agree with the XLA wavefront regen loop up
to the documented deviations: the in-kernel acos polynomial (|err| <= 2e-8
rad) and compacted-phase partial-sum regrouping (few ulps).
"""

import numpy as np
import jax.numpy as jnp

from rayfinder_tpu.render.camera import create_camera
from rayfinder_tpu.render.pathtracer import accumulate_samples_regen
from rayfinder_tpu.render.rng import blue_noise_tile
from rayfinder_tpu.sky.model import sky_state_from_ui


def test_acos_poly_accuracy():
    from rayfinder_tpu.ops.pallas_regen import acos_poly

    x = np.linspace(-1.0, 1.0, 40001, dtype=np.float32)
    got = np.asarray(acos_poly(jnp.asarray(x)))
    want = np.arccos(x.astype(np.float64))
    assert np.max(np.abs(got - want)) < 5e-7  # A&S 4.4.45: 2e-8 + f32 eval noise


def test_fused_regen_matches_wavefront(duck_device_scene):
    w, h, spp, nb = 64, 48, 4, 3
    cam = create_camera([2.0, 1.5, 2.0], [0.1, 0.8, 0.0], 0.3, 2.5, 70.0, w / h)
    sky = sky_state_from_ui(1.0, (1.0, 1.0, 1.0), 30.0, 0.0)
    tile = jnp.asarray(blue_noise_tile())
    kw = dict(width=w, height=h, num_bounces=nb, spp=spp, num_frames=spp)

    wave = accumulate_samples_regen(
        duck_device_scene, sky, cam, tile, jnp.int32(0),
        jnp.zeros((w * h, 3), jnp.float32), engine="wavefront", **kw,
    )
    fused = accumulate_samples_regen(
        duck_device_scene, sky, cam, tile, jnp.int32(0),
        jnp.zeros((w * h, 3), jnp.float32), engine="pallas", **kw,
    )
    # rtol budget: the acos polynomial (2e-8 rad) amplifies through the
    # Perez exp(p4 * gamma) on near-sun pixels; observed max 4e-5 relative.
    np.testing.assert_allclose(
        np.asarray(fused), np.asarray(wave), rtol=2e-4, atol=1e-5
    )


def test_fused_regen_pair_sweep(duck_device_scene, monkeypatch):
    """The pair-sweep prologue (RAYFINDER_PAIR, fused NEE occlusion +
    first closest sweep) must match the split prologue bit-for-bit, with
    and without the tile-skip guards / pipelined selection."""
    import rayfinder_tpu.ops.pallas_regen as pr
    import rayfinder_tpu.ops.pallas_walk as pw

    w, h, spp, nb = 64, 48, 4, 3
    cam = create_camera([2.0, 1.5, 2.0], [0.1, 0.8, 0.0], 0.3, 2.5, 70.0, w / h)
    sky = sky_state_from_ui(1.0, (1.0, 1.0, 1.0), 30.0, 0.0)
    tile = jnp.asarray(blue_noise_tile())
    kw = dict(width=w, height=h, num_bounces=nb, spp=spp, num_frames=spp)

    base = accumulate_samples_regen(
        duck_device_scene, sky, cam, tile, jnp.int32(0),
        jnp.zeros((w * h, 3), jnp.float32), engine="pallas", **kw,
    )
    monkeypatch.setattr(pr, "_PAIR", True)
    for root_skip in (False, True):
        monkeypatch.setattr(pw, "_ROOT_SKIP", root_skip)
        pair = accumulate_samples_regen(
            duck_device_scene, sky, cam, tile, jnp.int32(0),
            jnp.zeros((w * h, 3), jnp.float32), engine="pallas", **kw,
        )
        np.testing.assert_allclose(
            np.asarray(pair), np.asarray(base), rtol=0, atol=0
        )


def test_fused_regen_procedural_scene():
    """Textureless triangle-soup scene (1x1 white texel, degenerate-normal
    candidates) through the fused kernel."""
    import sys
    sys.path.insert(0, str(__import__("pathlib").Path(__file__).parent.parent))
    from __graft_entry__ import _procedural_scene

    scene = _procedural_scene(num_triangles=256)
    w, h, spp = 40, 32, 3
    cam = create_camera([0.0, 0.0, 12.0], [0.0, 0.0, 0.0], 0.0, 1.0, 70.0, w / h)
    sky = sky_state_from_ui(1.5, (0.8, 0.8, 0.8), 35.0, 10.0)
    tile = jnp.asarray(blue_noise_tile())
    kw = dict(width=w, height=h, num_bounces=3, spp=spp, num_frames=spp)

    wave = accumulate_samples_regen(
        scene, sky, cam, tile, jnp.int32(0),
        jnp.zeros((w * h, 3), jnp.float32), engine="wavefront", **kw,
    )
    fused = accumulate_samples_regen(
        scene, sky, cam, tile, jnp.int32(0),
        jnp.zeros((w * h, 3), jnp.float32), engine="pallas", **kw,
    )
    np.testing.assert_allclose(
        np.asarray(fused), np.asarray(wave), rtol=2e-4, atol=1e-5
    )


def test_fused_regen_compaction(duck_device_scene):
    """Forced compaction (tiny floor) agrees with the single-phase fused run
    up to the documented partial-sum regrouping."""
    w, h, spp, nb = 64, 48, 6, 4
    cam = create_camera([2.0, 1.5, 2.0], [0.1, 0.8, 0.0], 0.0, 1.0, 70.0, w / h)
    sky = sky_state_from_ui(2.0, (0.6, 0.6, 0.6), 40.0, 30.0)
    tile = jnp.asarray(blue_noise_tile())
    kw = dict(width=w, height=h, num_bounces=nb, spp=spp, num_frames=spp,
              engine="pallas")

    one = accumulate_samples_regen(
        duck_device_scene, sky, cam, tile, jnp.int32(0),
        jnp.zeros((w * h, 3), jnp.float32), compact_floor=w * h, **kw,
    )
    compacted = accumulate_samples_regen(
        duck_device_scene, sky, cam, tile, jnp.int32(0),
        jnp.zeros((w * h, 3), jnp.float32), compact_floor=16, **kw,
    )
    np.testing.assert_allclose(
        np.asarray(compacted), np.asarray(one), rtol=1e-5, atol=1e-6
    )


def test_fused_regen_single_bounce(duck_device_scene):
    """num_bounces=1: every hit terminates through the kernel's NEE prologue
    (flag==2 path) — no scatter continuations at all."""
    w, h, spp = 48, 32, 3
    cam = create_camera([2.0, 1.5, 2.0], [0.1, 0.8, 0.0], 0.0, 1.0, 70.0, w / h)
    sky = sky_state_from_ui(1.0, (1.0, 1.0, 1.0), 30.0, 0.0)
    tile = jnp.asarray(blue_noise_tile())
    kw = dict(width=w, height=h, num_bounces=1, spp=spp, num_frames=spp)

    wave = accumulate_samples_regen(
        duck_device_scene, sky, cam, tile, jnp.int32(0),
        jnp.zeros((w * h, 3), jnp.float32), engine="wavefront", **kw,
    )
    fused = accumulate_samples_regen(
        duck_device_scene, sky, cam, tile, jnp.int32(0),
        jnp.zeros((w * h, 3), jnp.float32), engine="pallas", **kw,
    )
    np.testing.assert_allclose(
        np.asarray(fused), np.asarray(wave), rtol=2e-4, atol=1e-5
    )


def test_fused_regen_frame_base(duck_device_scene):
    """Two fused dispatches of spp/2 == one dispatch of spp."""
    w, h, spp = 32, 24, 4
    cam = create_camera([2.0, 1.5, 2.0], [0.1, 0.8, 0.0], 0.0, 1.0, 70.0, w / h)
    sky = sky_state_from_ui(2.0, (0.5, 0.5, 0.5), 45.0, 90.0)
    tile = jnp.asarray(blue_noise_tile())
    kw = dict(width=w, height=h, num_bounces=2, spp=spp, engine="pallas")

    one = accumulate_samples_regen(
        duck_device_scene, sky, cam, tile, jnp.int32(0),
        jnp.zeros((w * h, 3), jnp.float32), num_frames=spp, **kw,
    )
    two = jnp.zeros((w * h, 3), jnp.float32)
    for base in (0, spp // 2):
        two = accumulate_samples_regen(
            duck_device_scene, sky, cam, tile, jnp.int32(base), two,
            num_frames=spp // 2, **kw,
        )
    np.testing.assert_allclose(np.asarray(two), np.asarray(one), rtol=1e-5, atol=1e-6)


def test_fused_regen_multi_super_scene():
    """An enclosed scene spanning several super-clusters: the path kernel's
    NEE prologue and trace loop must walk supers front-to-back with DMA
    (one-slot cache misses) and still agree with the XLA wavefront regen."""
    from rayfinder_tpu.render.scene import build_device_scene
    from rayfinder_tpu.scene.procedural import courtyard_scene
    from rayfinder_tpu.ops.pallas_walk import SUPER

    flat, textures = courtyard_scene(8)  # ~24K tris
    scene = build_device_scene(flat, textures=textures)
    assert scene.cluster_tris.shape[0] > SUPER  # spans >1 super

    w, h, spp = 32, 24, 2
    cam = create_camera([-16.0, 5.0, 0.0], [12.0, 2.0, 0.0], 0.0, 1.0, 70.0, w / h)
    sky = sky_state_from_ui(2.5, (0.3, 0.3, 0.3), 35.0, 25.0)
    tile = jnp.asarray(blue_noise_tile())
    kw = dict(width=w, height=h, num_bounces=3, spp=spp, num_frames=spp)

    wave = accumulate_samples_regen(
        scene, sky, cam, tile, jnp.int32(0),
        jnp.zeros((w * h, 3), jnp.float32), engine="wavefront", **kw,
    )
    fused = accumulate_samples_regen(
        scene, sky, cam, tile, jnp.int32(0),
        jnp.zeros((w * h, 3), jnp.float32), engine="pallas", **kw,
    )
    np.testing.assert_allclose(
        np.asarray(fused), np.asarray(wave), rtol=2e-4, atol=1e-5
    )


def test_fused_regen_sorted(duck_device_scene, monkeypatch):
    """Forced per-iteration lane sorting (_accumulate_regen_fused_sorted):
    the packed-gather permutation, migrating pixel map, and phase-end
    scatter-adds must reproduce the wavefront regen result. Unique (w, h)
    so the trace re-reads RAYFINDER_REGEN_SORT."""
    monkeypatch.setenv("RAYFINDER_REGEN_SORT", "1")
    w, h, spp, nb = 56, 40, 4, 3
    cam = create_camera([2.0, 1.5, 2.0], [0.1, 0.8, 0.0], 0.0, 1.0, 70.0, w / h)
    sky = sky_state_from_ui(1.0, (1.0, 1.0, 1.0), 30.0, 0.0)
    tile = jnp.asarray(blue_noise_tile())
    kw = dict(width=w, height=h, num_bounces=nb, spp=spp, num_frames=spp)

    wave = accumulate_samples_regen(
        duck_device_scene, sky, cam, tile, jnp.int32(0),
        jnp.zeros((w * h, 3), jnp.float32), engine="wavefront", **kw,
    )
    fused = accumulate_samples_regen(
        duck_device_scene, sky, cam, tile, jnp.int32(0),
        jnp.zeros((w * h, 3), jnp.float32), engine="pallas",
        compact_floor=128, **kw,
    )
    np.testing.assert_allclose(
        np.asarray(fused), np.asarray(wave), rtol=2e-4, atol=1e-5
    )


def test_inkernel_shade_matches_split(duck_device_scene, monkeypatch):
    """The in-kernel-shaded kernel (pallas_trace_regen_shaded) must reproduce
    the split kernel + XLA shade loop: the one-hot bf16-split attribute
    gather and texel matmul-gather are exact and the shade arithmetic mirrors
    _nee_and_continuation op-for-op. Residual differences are FMA/fusion
    reassociation between the two compilation paths (measured max 2e-5
    relative on ~5% of pixels) — far inside the 1e-3 RMSE contract.
    jax.clear_caches() forces a retrace so the same shape re-reads
    RAYFINDER_INKERNEL."""
    import jax

    w, h, spp, nb = 48, 40, 4, 3
    cam = create_camera([2.0, 1.5, 2.0], [0.1, 0.8, 0.0], 0.3, 2.5, 70.0, w / h)
    sky = sky_state_from_ui(1.0, (1.0, 1.0, 1.0), 30.0, 0.0)
    tile = jnp.asarray(blue_noise_tile())
    kw = dict(width=w, height=h, num_bounces=nb, spp=spp, num_frames=spp)

    from rayfinder_tpu.render import pathtracer as pt

    monkeypatch.setenv("RAYFINDER_INKERNEL", "1")
    assert pt._inkernel_enabled(duck_device_scene)
    jax.clear_caches()
    inker = np.asarray(accumulate_samples_regen(
        duck_device_scene, sky, cam, tile, jnp.int32(0),
        jnp.zeros((w * h, 3), jnp.float32), engine="pallas", **kw,
    ))
    # Phased hybrid (split phase 0 + floor-chained shaded calls): force
    # compaction with a tiny floor.
    hybrid = np.asarray(accumulate_samples_regen(
        duck_device_scene, sky, cam, tile, jnp.int32(0),
        jnp.zeros((w * h, 3), jnp.float32), engine="pallas",
        compact_floor=128, **kw,
    ))
    monkeypatch.setenv("RAYFINDER_INKERNEL", "0")
    jax.clear_caches()
    split = np.asarray(accumulate_samples_regen(
        duck_device_scene, sky, cam, tile, jnp.int32(0),
        jnp.zeros((w * h, 3), jnp.float32), engine="pallas", **kw,
    ))
    np.testing.assert_allclose(inker, split, rtol=1e-4, atol=2e-3)
    np.testing.assert_allclose(hybrid, split, rtol=1e-4, atol=2e-3)


def test_fused_regen_segs_matches_wavefront(duck_device_scene, monkeypatch):
    """RAYFINDER_SEGS=K (multi-hit-segment kernel): per-sample radiance is
    bit-identical to the single-slot loop (the noise stream depends only on
    the sample index); only the f32 add order into lane accumulators
    regroups — same rtol budget as the fused/wavefront agreement. Exact ray
    counters must be preserved."""
    w, h, spp, nb = 64, 48, 4, 3
    cam = create_camera([2.0, 1.5, 2.0], [0.1, 0.8, 0.0], 0.3, 2.5, 70.0, w / h)
    sky = sky_state_from_ui(1.0, (1.0, 1.0, 1.0), 30.0, 0.0)
    tile = jnp.asarray(blue_noise_tile())
    kw = dict(width=w, height=h, num_bounces=nb, spp=spp, num_frames=spp)

    wave, wave_rays = accumulate_samples_regen(
        duck_device_scene, sky, cam, tile, jnp.int32(0),
        jnp.zeros((w * h, 3), jnp.float32), engine="wavefront",
        count_rays=True, **kw,
    )
    for k, floor in ((2, None), (3, 128)):
        monkeypatch.setenv("RAYFINDER_SEGS", str(k))
        fused, rays = accumulate_samples_regen(
            duck_device_scene, sky, cam, tile, jnp.int32(0),
            jnp.zeros((w * h, 3), jnp.float32), engine="pallas",
            count_rays=True, compact_floor=floor, **kw,
        )
        np.testing.assert_allclose(
            np.asarray(fused), np.asarray(wave), rtol=2e-4, atol=1e-5
        )
        np.testing.assert_array_equal(np.asarray(rays), np.asarray(wave_rays))
