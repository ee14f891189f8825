"""Pallas cluster-sweep kernels vs the XLA wavefront walk (interpreter mode
on CPU; the same comparisons run compiled on real TPU in bench/dev loops)."""

import numpy as np
import jax.numpy as jnp
import pytest

from rayfinder_tpu.ops.pallas_walk import (
    pallas_intersect_any,
    pallas_intersect_closest,
)
from rayfinder_tpu.render.wavefront import (
    intersect_any_wavefront,
    intersect_closest_wavefront,
)


@pytest.fixture(scope="module")
def rays(duck_device_scene):
    scene = duck_device_scene
    lo = np.asarray(scene.bvh_aabb_min[0])
    hi = np.asarray(scene.bvh_aabb_max[0])
    rng = np.random.default_rng(99)
    n = 256
    o = rng.uniform(lo - 0.5, hi + 0.5, size=(n, 3)).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return jnp.asarray(o), jnp.asarray(d)


def test_pallas_closest_matches_wavefront(duck_device_scene, rays):
    o, d = rays
    t_max = jnp.float32(1e4)
    ph, pt, ptri = pallas_intersect_closest(duck_device_scene, o, d, t_max)
    wh, wt, wtri, _ = intersect_closest_wavefront(duck_device_scene, o, d, t_max)

    np.testing.assert_array_equal(np.asarray(ph), np.asarray(wh))
    both = np.asarray(ph)
    np.testing.assert_allclose(
        np.asarray(pt)[both], np.asarray(wt)[both], rtol=2e-6, atol=1e-6
    )
    # Near-identical fusion: triangles should agree everywhere but exact ties.
    agree = (np.asarray(ptri)[both] == np.asarray(wtri)[both]).mean()
    assert agree >= 0.999


def test_pallas_any_matches_wavefront(duck_device_scene, rays):
    o, d = rays
    t_max = jnp.float32(1e4)
    po = pallas_intersect_any(duck_device_scene, o, d, t_max)
    wo, _ = intersect_any_wavefront(duck_device_scene, o, d, t_max)
    np.testing.assert_array_equal(np.asarray(po), np.asarray(wo))


def test_pallas_multi_super_scene():
    """A scene spanning several super-clusters (the grid's second dimension)
    must agree with the XLA walk — exercises output-block accumulation
    across grid steps."""
    from rayfinder_tpu.render.scene import build_device_scene
    from rayfinder_tpu.scene.procedural import courtyard_scene

    flat, textures = courtyard_scene(8)  # ~24K tris -> several super-clusters
    scene = build_device_scene(flat, textures=textures)
    assert scene.cluster_tris.shape[0] > 64  # spans >1 super

    rng = np.random.default_rng(3)
    n = 128
    o = rng.uniform([-18, 1, -8], [18, 10, 8], size=(n, 3)).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    t_max = jnp.float32(1e4)

    ph, pt, ptri = pallas_intersect_closest(scene, jnp.asarray(o), jnp.asarray(d), t_max)
    wh, wt, wtri, _ = intersect_closest_wavefront(scene, jnp.asarray(o), jnp.asarray(d), t_max)
    np.testing.assert_array_equal(np.asarray(ph), np.asarray(wh))
    both = np.asarray(ph)
    np.testing.assert_allclose(
        np.asarray(pt)[both], np.asarray(wt)[both], rtol=2e-6, atol=1e-6
    )

    po = pallas_intersect_any(scene, jnp.asarray(o), jnp.asarray(d), t_max)
    wo, _ = intersect_any_wavefront(scene, jnp.asarray(o), jnp.asarray(d), t_max)
    np.testing.assert_array_equal(np.asarray(po), np.asarray(wo))


def test_pallas_grouped_matches_flat(duck_device_scene, rays, monkeypatch):
    """The grouped (per-lane selection, dynamic_gather lane-shuffle) sweeps
    must return exactly the flat sweeps' results — same MT numerics, only
    the cluster visit order differs. Covers the single-super fast path
    (Duck) and the multi-super outer loop (courtyard slice) for both
    kernels. NOTE: interpret-mode equality cannot catch TPU-side gather
    inexactness; prof/check_grouped_exact.py is the on-device check."""
    import jax.numpy as jnp
    from rayfinder_tpu.ops import pallas_walk as pw
    from rayfinder_tpu.render.scene import build_device_scene
    from rayfinder_tpu.scene.procedural import courtyard_scene

    flat, textures = courtyard_scene(8)
    multi = build_device_scene(flat, textures=textures)
    assert multi.cluster_tris.shape[0] > pw.SUPER_G  # spans >1 grouped super

    o, d = rays
    rng = np.random.default_rng(11)
    oc = rng.uniform([-18, 1, -8], [18, 10, 8], size=(128, 3)).astype(np.float32)
    dc = rng.normal(size=(128, 3)).astype(np.float32)
    dc /= np.linalg.norm(dc, axis=-1, keepdims=True)
    t_max = jnp.float32(1e4)

    def run(scene, o, d, mode):
        monkeypatch.setenv("RAYFINDER_GROUPED", mode)
        (t_out, tri_out), n, _ = pw._common_call(
            scene, o, d, t_max, pw._make_closest_kernel, (jnp.float32, jnp.int32)
        )
        (occ,), _, _ = pw._common_call(
            scene, o, d, t_max, pw._make_any_kernel, (jnp.int32,)
        )
        return (
            np.asarray(t_out).reshape(-1)[:n],
            np.asarray(tri_out).reshape(-1)[:n],
            np.asarray(occ).reshape(-1)[:n],
        )

    for scene, so, sd in [
        (duck_device_scene, o, d),
        (multi, jnp.asarray(oc), jnp.asarray(dc)),
    ]:
        tf, trif, occf = run(scene, so, sd, "0")
        tg, trig, occg = run(scene, so, sd, "1")
        np.testing.assert_array_equal(occf, occg)
        np.testing.assert_array_equal(trif, trig)
        np.testing.assert_allclose(tf, tg, rtol=0, atol=0)

    # Every grouped selection path must agree exactly on the multi-super
    # scene (visit order may differ; MT numerics and accepts may not):
    # the default `run(..., "1")` above is the per-visit path with the
    # union-box super test (_SUBBOX=1). Cover the sub-box refinement
    # (SUBBOX=8), the opt-in prebuilt path, then the K-aggregated paths at
    # KRAYS=4 (monotone-act _act_select and K-table _act_and_select).
    assert pw._SUBBOX == 1, "default must be the union-box super test"
    assert not pw._PREBUILT, "prebuilt is opt-in (measured regression)"
    monkeypatch.setattr(pw, "_SUBBOX", 8)
    tv, triv, occv = run(multi, jnp.asarray(oc), jnp.asarray(dc), "1")
    np.testing.assert_array_equal(occv, occg)
    np.testing.assert_array_equal(triv, trig)
    np.testing.assert_allclose(tv, tg, rtol=0, atol=0)
    monkeypatch.setattr(pw, "_SUBBOX", 1)

    monkeypatch.setattr(pw, "_PREBUILT", True)
    tv, triv, occv = run(multi, jnp.asarray(oc), jnp.asarray(dc), "1")
    np.testing.assert_array_equal(occv, occg)
    np.testing.assert_array_equal(triv, trig)
    np.testing.assert_allclose(tv, tg, rtol=0, atol=0)
    # Chunked build path (chunk > 1: this scene's super count divides 3).
    assert pw._scene_tables_grouped(multi)[0].shape[0] % 3 == 0
    monkeypatch.setattr(pw, "_PREBUILD_CHUNK", 3)
    tv, triv, occv = run(multi, jnp.asarray(oc), jnp.asarray(dc), "1")
    np.testing.assert_array_equal(occv, occg)
    np.testing.assert_array_equal(triv, trig)
    np.testing.assert_allclose(tv, tg, rtol=0, atol=0)
    monkeypatch.setattr(pw, "_PREBUILD_CHUNK", 8)
    monkeypatch.setattr(pw, "_PREBUILT", False)

    assert pw.KRAYS == 1, "default must be KRAYS=1 (round-2 judge bisect)"
    monkeypatch.setattr(pw, "KRAYS", 4)
    assert pw._ACTSEL, "default must be the monotone-act path"
    tm, trim, occm = run(multi, jnp.asarray(oc), jnp.asarray(dc), "1")
    np.testing.assert_array_equal(occm, occg)
    np.testing.assert_array_equal(trim, trig)
    np.testing.assert_allclose(tm, tg, rtol=0, atol=0)

    monkeypatch.setattr(pw, "_ACTSEL", False)
    tm, trim, occm = run(multi, jnp.asarray(oc), jnp.asarray(dc), "1")
    np.testing.assert_array_equal(occm, occg)
    np.testing.assert_array_equal(trim, trig)
    np.testing.assert_allclose(tm, tg, rtol=0, atol=0)

    tf0, trif0, occf0 = run(duck_device_scene, o, d, "0")

    # Tile-level skip guards (_ROOT_SKIP): the root-AABB pre-reject and the
    # pending-bound occlusion guard must not change any result (they skip
    # only tiles that would test nothing).
    monkeypatch.setattr(pw, "_ROOT_SKIP", True)
    tr, trir, occr = run(duck_device_scene, o, d, "0")
    np.testing.assert_array_equal(occr, occf0)
    np.testing.assert_array_equal(trir, trif0)
    np.testing.assert_allclose(tr, tf0, rtol=0, atol=0)
    monkeypatch.setattr(pw, "_ROOT_SKIP", False)

    # Sync-free selection prefix (_SWEEP_PREFIX): P unrolled front-to-back
    # tests before the while loop; bound-guarded, so results are exact.
    monkeypatch.setattr(pw, "_SWEEP_PREFIX", 4)
    ts_, tris_, occs_ = run(duck_device_scene, o, d, "0")
    np.testing.assert_array_equal(occs_, occf0)
    np.testing.assert_array_equal(tris_, trif0)
    np.testing.assert_allclose(ts_, tf0, rtol=0, atol=0)
    monkeypatch.setattr(pw, "_ROOT_SKIP", True)
    ts_, tris_, occs_ = run(duck_device_scene, o, d, "0")
    np.testing.assert_array_equal(occs_, occf0)
    np.testing.assert_array_equal(tris_, trif0)
    np.testing.assert_allclose(ts_, tf0, rtol=0, atol=0)
    monkeypatch.setattr(pw, "_ROOT_SKIP", False)
    monkeypatch.setattr(pw, "_SWEEP_PREFIX", 0)

    # Pipelined super selection (_PIPE_SUPER): stale-bound next-super pick
    # may reorder/over-visit but never changes accepts.
    monkeypatch.setattr(pw, "_PIPE_SUPER", True)
    tp_, trip_, occp_ = run(multi, jnp.asarray(oc), jnp.asarray(dc), "1")
    np.testing.assert_array_equal(occp_, occg)
    np.testing.assert_array_equal(trip_, trig)
    np.testing.assert_allclose(tp_, tg, rtol=0, atol=0)
    monkeypatch.setattr(pw, "_PIPE_SUPER", False)


def test_super_boxes_exclude_pad_clusters():
    """Pad clusters are (1e30)^3 point boxes; the super/sub-box unions must
    exclude them or every padded super's max corner blows out to 1e30 (the
    box then contains nearly every ray origin: entry 0, no far-plane
    pruning, scrambled front-to-back order — a measured courtyard perf bug,
    2026-08-19)."""
    from rayfinder_tpu.ops import pallas_walk as pw
    from rayfinder_tpu.render.scene import build_device_scene
    from rayfinder_tpu.scene.procedural import courtyard_scene

    flat, textures = courtyard_scene(8)
    scene = build_device_scene(flat, textures=textures)

    # Grouped layout (big scenes): every super has pads (subtree runs).
    _, _, smin, smax, _ = pw._scene_tables_grouped(scene)
    smax = np.asarray(smax)  # (K, 3, S)
    smin = np.asarray(smin)
    real = np.isfinite(smin).all(axis=1) & np.isfinite(smax).all(axis=1)
    assert real.any()
    assert np.abs(smax[:, :, real.any(axis=0)]).max() < 1e6, (
        "super union max corner includes FAR pad boxes"
    )

    # Flat layout: the last super is padded to a SUPER multiple.
    _, _, fmin, fmax, _ = pw._scene_tables(scene)
    fmax = np.asarray(fmax)  # (3, S)
    fin = np.isfinite(fmax).all(axis=0)
    assert np.abs(fmax[:, fin]).max() < 1e6


def test_grouped_prefix_rounds(duck_device_scene, monkeypatch, rays):
    """_GPREFIX unconditional first rounds must not change any result (all
    tested pairs are bound-guarded; erasing a tested row is safe)."""
    import numpy as np

    from rayfinder_tpu.ops import pallas_walk as pw
    from rayfinder_tpu.render.scene import build_device_scene
    from rayfinder_tpu.scene.procedural import courtyard_scene

    flat, textures = courtyard_scene(8)
    multi = build_device_scene(flat, textures=textures)
    rng = np.random.default_rng(11)
    oc = rng.uniform([-18, 1, -8], [18, 10, 8], size=(128, 3)).astype(np.float32)
    dc = rng.normal(size=(128, 3)).astype(np.float32)
    dc /= np.linalg.norm(dc, axis=-1, keepdims=True)
    t_max = jnp.float32(1e4)

    def run(scene, o, d):
        monkeypatch.setenv("RAYFINDER_GROUPED", "1")
        (t_out, tri_out), n, _ = pw._common_call(
            scene, o, d, t_max, pw._make_closest_kernel, (jnp.float32, jnp.int32)
        )
        (occ,), _, _ = pw._common_call(
            scene, o, d, t_max, pw._make_any_kernel, (jnp.int32,)
        )
        return (
            np.asarray(t_out).reshape(-1)[:n],
            np.asarray(tri_out).reshape(-1)[:n],
            np.asarray(occ).reshape(-1)[:n],
        )

    tg, trig, occg = run(multi, jnp.asarray(oc), jnp.asarray(dc))
    for p in (1, 2):
        monkeypatch.setattr(pw, "_GPREFIX", p)
        tp, trip, occp = run(multi, jnp.asarray(oc), jnp.asarray(dc))
        np.testing.assert_array_equal(occp, occg)
        np.testing.assert_array_equal(trip, trig)
        np.testing.assert_allclose(tp, tg, rtol=0, atol=0)
    monkeypatch.setattr(pw, "_GPREFIX", 0)
