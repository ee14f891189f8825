"""Sorted pair-traversal engine (ops/pallas_pairs.py) vs the lockstep
reference: exact agreement on hit/miss, distance, and triangle — camera
rays, interior rays with forced tail traffic, parked lanes, and the full
radiance path through engine='pairs'."""

import numpy as np
import jax.numpy as jnp
import pytest

from rayfinder_tpu.ops.pallas_pairs import pairs_intersect_closest
from rayfinder_tpu.render.traverse import intersect_closest


@pytest.fixture(scope="module")
def courtyard_device_scene():
    from rayfinder_tpu.render.scene import build_device_scene
    from rayfinder_tpu.scene.procedural import courtyard_scene

    flat, textures = courtyard_scene(8)  # ~24K tris, enclosed, many clusters
    return build_device_scene(flat, textures=textures)


def _interior_rays(rng, n):
    o = rng.uniform([-18, 0.5, -9], [18, 10.0, 9], size=(n, 3)).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return jnp.asarray(o), jnp.asarray(d)


def _assert_closest_agrees(scene, o, d, t_max=1e4, min_tail=None, w=None):
    t_max = jnp.float32(t_max)
    ref_hit, ref_t, ref_tri, _ = intersect_closest(scene, o, d, t_max)
    kw = {} if w is None else {"w": w}
    pw_hit, pw_t, pw_tri, tail = pairs_intersect_closest(scene, o, d, t_max, **kw)
    if min_tail is not None:
        assert int(tail) >= min_tail, "test rays failed to exercise the tail"
    np.testing.assert_array_equal(np.asarray(pw_hit), np.asarray(ref_hit))
    hits = np.asarray(ref_hit)
    # Same formula, different fusion: t agrees to last-ulp, not bit-exactly.
    np.testing.assert_allclose(
        np.asarray(pw_t)[hits], np.asarray(ref_t)[hits], rtol=2e-6, atol=1e-6
    )
    # Triangle ids may differ only where two surfaces tie on t within float
    # fusion variance — never from a skipped cluster (that would flip
    # hit/miss or move t, asserted exact above).
    mismatch = hits & (np.asarray(pw_tri) != np.asarray(ref_tri))
    assert mismatch.sum() <= 0.01 * max(hits.sum(), 1)


def test_closest_duck_camera_rays(duck_device_scene):
    from tests.test_wavefront import _camera_rays

    o, d = _camera_rays(duck_device_scene)
    _assert_closest_agrees(duck_device_scene, o, d)


def test_closest_duck_random_rays(duck_device_scene, rng):
    scene = duck_device_scene
    lo = np.asarray(scene.bvh_aabb_min[0])
    hi = np.asarray(scene.bvh_aabb_max[0])
    o = rng.uniform(lo - 0.5, hi + 0.5, size=(512, 3)).astype(np.float32)
    d = rng.normal(size=(512, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    _assert_closest_agrees(scene, jnp.asarray(o), jnp.asarray(d))


def test_closest_courtyard_interior_tail(courtyard_device_scene, rng):
    """Interior scattered rays on the enclosed scene push real traffic
    through the compacted tail (the top-W wave can't prove them done) —
    results must stay exactly the reference's."""
    o, d = _interior_rays(rng, 2048)
    _assert_closest_agrees(courtyard_device_scene, o, d, min_tail=1)


def test_closest_courtyard_w1(courtyard_device_scene, rng):
    """w=1 forces a much larger tail fraction — stresses the chunked tail
    while-loop (multiple compaction iterations)."""
    o, d = _interior_rays(rng, 512)
    _assert_closest_agrees(courtyard_device_scene, o, d, min_tail=32, w=1)


def test_parked_rays_are_free_of_nans(duck_device_scene):
    """Parked lanes (origin 1e30, the regen loop's dead-lane convention)
    must report clean misses and no tail traffic."""
    o = jnp.full((256, 3), 1e30, jnp.float32)
    d = jnp.tile(jnp.asarray([[1.0, 0.0, 0.0]], jnp.float32), (256, 1))
    hit, t, tri, tail = pairs_intersect_closest(duck_device_scene, o, d, jnp.float32(1e4))
    assert not bool(jnp.any(hit))
    assert int(tail) == 0


def test_radiance_matches_wavefront_engine(duck_device_scene):
    """Full radiance path through engine='pairs' agrees with the wavefront
    engine to float-fusion tolerance."""
    from rayfinder_tpu.render.pathtracer import trace_radiance
    from rayfinder_tpu.sky.model import sky_state_from_ui
    from tests.test_wavefront import _camera_rays

    scene = duck_device_scene
    o, d = _camera_rays(scene, n=16)
    sky = sky_state_from_ui(1.0, (1.0, 1.0, 1.0), 30.0, 0.0)
    noise = jnp.tile(jnp.asarray([[0.4, 0.7]], jnp.float32), (o.shape[0], 1))
    a = trace_radiance(scene, sky, o, d, noise, 2, engine="wavefront")
    b = trace_radiance(scene, sky, o, d, noise, 2, engine="pairs")
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-5, atol=2e-5)


def test_any_hit_agrees(courtyard_device_scene, rng):
    from rayfinder_tpu.ops.pallas_pairs import pairs_intersect_any
    from rayfinder_tpu.render.traverse import intersect_any

    o, d = _interior_rays(rng, 2048)
    t_max = jnp.float32(1e4)
    ref = intersect_any(courtyard_device_scene, o, d, t_max)
    pw, tail = pairs_intersect_any(courtyard_device_scene, o, d, t_max)
    np.testing.assert_array_equal(np.asarray(pw), np.asarray(ref))


def test_any_hit_w1_tail(courtyard_device_scene, rng):
    """w=1 forces tail traffic through the production any-hit sweep."""
    from rayfinder_tpu.ops.pallas_pairs import pairs_intersect_any
    from rayfinder_tpu.render.traverse import intersect_any

    o, d = _interior_rays(rng, 512)
    t_max = jnp.float32(1e4)
    ref = intersect_any(courtyard_device_scene, o, d, t_max)
    pw, tail = pairs_intersect_any(courtyard_device_scene, o, d, t_max, w=1)
    assert int(tail) > 0
    np.testing.assert_array_equal(np.asarray(pw), np.asarray(ref))


def test_any_hit_duck(duck_device_scene, rng):
    from rayfinder_tpu.ops.pallas_pairs import pairs_intersect_any
    from rayfinder_tpu.render.traverse import intersect_any

    scene = duck_device_scene
    lo = np.asarray(scene.bvh_aabb_min[0])
    hi = np.asarray(scene.bvh_aabb_max[0])
    o = rng.uniform(lo - 0.5, hi + 0.5, size=(512, 3)).astype(np.float32)
    d = rng.normal(size=(512, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    ref = intersect_any(scene, jnp.asarray(o), jnp.asarray(d), jnp.float32(1e4))
    pw, _ = pairs_intersect_any(scene, jnp.asarray(o), jnp.asarray(d),
                                jnp.float32(1e4))
    np.testing.assert_array_equal(np.asarray(pw), np.asarray(ref))
