"""Time the sorted pair-traversal closest query vs the production pallas
sweep on the dumped courtyard ray sets (/tmp/court_rays.npz), with a phase
split (cull kernel / sort+gather / visit kernel / tail). Scan-chained reps,
fenced. Usage: python -u prof/prof_pairs.py [tags...]"""
import sys; sys.path.insert(0, "/root/repo")
import os, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
import numpy as np
import jax, jax.numpy as jnp

from rayfinder_tpu.ops.pallas_walk import pallas_intersect_closest
from rayfinder_tpu.ops.pallas_pairs import (
    PAIRS_W, _CID_BITS, _CID_MASK, _cull_topw, _visit,
    pairs_intersect_closest)
from rayfinder_tpu.render.scene import build_device_scene
from rayfinder_tpu.scene.procedural import courtyard_scene

REPS = int(os.environ.get("REPS", "10"))
TAGS = sys.argv[1:] or ["primary", "bounce1srt", "bounce2srt"]
fence = jax.jit(lambda a: jnp.sum(a))

flat, textures = courtyard_scene(26)
scene = build_device_scene(flat, textures=textures)
print(f"clusters {scene.cluster_tris.shape[0]} W {PAIRS_W}")
z = np.load("/tmp/court_rays.npz")


def timed(label, fn, *args):
    r = fn(*args)
    float(fence(r if not isinstance(r, tuple) else r[0]))
    t0 = time.time()
    r = fn(*args)
    float(fence(r if not isinstance(r, tuple) else r[0]))
    dt = (time.time() - t0) / REPS
    print(f"  {label:>10}: {dt*1e3:7.2f} ms/pass", flush=True)
    return r


for tag in TAGS:
    o = jnp.asarray(z[f"{tag}_o"])
    d = jnp.asarray(z[f"{tag}_d"])
    B = o.shape[0]
    tm = jnp.full((B,), 1e4, jnp.float32)
    print(f"{tag}: rays {B}")

    def chain(fn):
        @jax.jit
        def run(o, d):
            def body(c, _):
                r = fn(c[0], c[1])
                return (c[0] + 1e-7 * r[:, None], c[1]), None
            c, _ = jax.lax.scan(body, (o, d), None, length=REPS)
            return c[0]
        return run

    timed("pallas", chain(
        lambda o_, d_: pallas_intersect_closest(scene, o_, d_, jnp.float32(1e4))[1]), o, d)
    timed("cull", chain(
        lambda o_, d_: _cull_topw(scene, o_, d_, tm, PAIRS_W + 1)[:, 0].astype(jnp.float32)), o, d)

    def cullsort(o_, d_):
        keys = _cull_topw(scene, o_, d_, tm, PAIRS_W + 1)
        sk = (keys[:, 0] & _CID_MASK) * jnp.int32(1 << _CID_BITS) + (
            keys[:, 1] & _CID_MASK)
        perm = jnp.argsort(sk).astype(jnp.int32)
        packed = jnp.concatenate(
            [o_, d_, tm[:, None],
             jax.lax.bitcast_convert_type(keys, jnp.float32)], axis=1)[perm]
        return packed

    timed("cull+sort", chain(lambda o_, d_: cullsort(o_, d_)[:, 0]), o, d)

    def cullsortvisit(o_, d_):
        packed = cullsort(o_, d_)
        keys_s = jax.lax.bitcast_convert_type(packed[:, 7:], jnp.int32)
        t_s, tri_s = _visit(scene, packed[:, 0:3], packed[:, 3:6],
                            packed[:, 6], keys_s, PAIRS_W)
        return t_s

    timed("+visit", chain(cullsortvisit), o, d)

    @jax.jit
    def full(o_, d_):
        def body(c, _):
            hit, t, tri, tc = pairs_intersect_closest(scene, c[0], c[1],
                                                      jnp.float32(1e4))
            return (c[0] + 1e-7 * t[:, None], c[1]), tc
        c, tcs = jax.lax.scan(body, (o, d), None, length=REPS)
        return c[0], tcs

    r = full(o, d); float(fence(r[0]))
    t0 = time.time()
    r = full(o, d); float(fence(r[0]))
    dt = (time.time() - t0) / REPS
    print(f"  {'pairs full':>10}: {dt*1e3:7.2f} ms/pass  tail "
          f"{np.asarray(r[1]).mean():.0f}/{B}", flush=True)
