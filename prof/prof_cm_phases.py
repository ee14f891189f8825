"""Phase breakdown of the cluster-major engine on the dumped courtyard ray
sets (/tmp/court_rays.npz from prof/dump_court_rays.py): cull (nearest-W+1
extraction), wave-1 walk, and full query (wave + compacted tail), vs the
production pallas engine on the same rays. Scan-chained reps, fenced."""
import sys; sys.path.insert(0, "/root/repo")
import os, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
import numpy as np
import jax, jax.numpy as jnp

from rayfinder_tpu.ops.pallas_walk import pallas_intersect_closest
from rayfinder_tpu.render.clustermajor import (
    WAVE_W, _chunked_top_entries, intersect_closest_cm)
from rayfinder_tpu.render.wavefront import _walk_closest
from rayfinder_tpu.render.scene import build_device_scene
from rayfinder_tpu.scene.procedural import courtyard_scene

REPS = int(os.environ.get("REPS", "10"))
TAGS = sys.argv[1:] or ["primary", "bounce1srt"]
fence = jax.jit(lambda a: jnp.sum(a))

flat, textures = courtyard_scene(26)
scene = build_device_scene(flat, textures=textures)
C = scene.cluster_tris.shape[0]
print(f"clusters {C} leaf {scene.cluster_tris.shape[1]} WAVE_W {WAVE_W}")
z = np.load("/tmp/court_rays.npz")


def timed(label, fn, *args):
    r = fn(*args); float(fence(r))
    t0 = time.time()
    r = fn(*args); float(fence(r))
    dt = (time.time() - t0) / REPS
    print(f"  {label:>10}: {dt*1e3:7.2f} ms/pass", flush=True)
    return dt


for tag in TAGS:
    o = jnp.asarray(z[f"{tag}_o"])
    d = jnp.asarray(z[f"{tag}_d"])
    B = o.shape[0]
    tm = jnp.full((B,), 1e4, jnp.float32)
    print(f"{tag}: rays {B}")

    @jax.jit
    def run_cull(o, d):
        def body(c, _):
            e, cid = _chunked_top_entries(scene, c[0], c[1], tm, WAVE_W + 1)
            return (c[0] + 1e-7 * e[:, :1], c[1]), None
        c, _ = jax.lax.scan(body, (o, d), None, length=REPS)
        return c[0]

    @jax.jit
    def run_cullwave(o, d):
        def body(c, _):
            e, cid = _chunked_top_entries(scene, c[0], c[1], tm, WAVE_W + 1)
            hit, t, tri = _walk_closest(scene, c[0], c[1], tm,
                                        e[:, :WAVE_W], cid[:, :WAVE_W])
            return (c[0] + 1e-7 * t[:, None], c[1]), None
        c, _ = jax.lax.scan(body, (o, d), None, length=REPS)
        return c[0]

    @jax.jit
    def run_full(o, d):
        def body(c, _):
            hit, t, tri, tc = intersect_closest_cm(scene, c[0], c[1], tm)
            return (c[0] + 1e-7 * t[:, None], c[1]), tc
        c, tcs = jax.lax.scan(body, (o, d), None, length=REPS)
        return c[0], tcs

    @jax.jit
    def run_pallas(o, d):
        def body(c, _):
            hit, t, tri = pallas_intersect_closest(scene, c[0], c[1],
                                                   jnp.float32(1e4))
            return (c[0] + 1e-7 * t[:, None], c[1]), None
        c, _ = jax.lax.scan(body, (o, d), None, length=REPS)
        return c[0]

    timed("pallas", run_pallas, o, d)
    timed("cull", run_cull, o, d)
    timed("cull+wave", run_cullwave, o, d)

    r = run_full(o, d); float(fence(r[0]))
    t0 = time.time()
    r = run_full(o, d); float(fence(r[0]))
    dt = (time.time() - t0) / REPS
    print(f"  {'cm full':>10}: {dt*1e3:7.2f} ms/pass  tail_count "
          f"{np.asarray(r[1]).mean():.0f}/{B}", flush=True)
