"""Variants of _surface_interaction: find the 3ms interpolation tail."""
import os, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
import numpy as np
import jax, jax.numpy as jnp
from rayfinder_tpu.render.scene import load_device_scene
from rayfinder_tpu.render.intersect import offset_ray, ray_triangle

B = 480000
REPS = 50
scene = load_device_scene("/root/reference/assets/Duck.glb")
key = jax.random.PRNGKey(0)
tri0 = jax.random.randint(key, (B,), 0, scene.tri_attrs.shape[0], dtype=jnp.int32)
o = jax.random.normal(key, (B, 3), jnp.float32)
d = jax.random.normal(key, (B, 3), jnp.float32)
d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)

fence = jax.jit(lambda a: jnp.sum(a))
def timed(name, fn, *args):
    r = fn(*args); float(fence(r))
    t0 = time.time(); r = fn(*args); float(fence(r))
    print(f"{name:16s} {(time.time()-t0)/REPS*1e3:8.3f} ms")

def scan(body):
    @jax.jit
    def run(tri, o, d):
        def step(c, _):
            tri, o, d = c
            out = body(tri, o, d)
            tri = (tri + 1 + (out.reshape(-1)[0]*0).astype(jnp.int32)) % scene.tri_attrs.shape[0]
            return (tri, o, d), None
        c, _ = jax.lax.scan(step, (tri, o, d), jnp.arange(REPS))
        return c[0].astype(jnp.float32)
    return run

from rayfinder_tpu.render.pathtracer import _surface_interaction
def full(tri, o, d):
    p, n, uv, tex, t = _surface_interaction(scene, o, d, tri)
    return p + n + jnp.pad(uv, ((0,0),(0,1))) + tex[:, None].astype(jnp.float32)

def full_flat(tri, o, d):
    attrs = scene.tri_attrs[tri]  # (B, 25)
    v0 = attrs[:, 0:3]; v1 = attrs[:, 3:6]; v2 = attrs[:, 6:9]
    _, t, u, v = ray_triangle(o, d, v0, v1, v2, jnp.float32(np.inf))
    e1 = v1 - v0; e2 = v2 - v0
    uc = u[:, None]; vc = v[:, None]
    p = v0 + uc * e1 + vc * e2
    geo_n = jnp.cross(e1, e2)
    geo_n = geo_n / jnp.linalg.norm(geo_n, axis=-1, keepdims=True)
    p_off = offset_ray(p, geo_n)
    b0 = jnp.float32(1.0) - uc - vc
    n = b0 * attrs[:, 9:12] + uc * attrs[:, 12:15] + vc * attrs[:, 15:18]
    uv = b0 * attrs[:, 18:20] + uc * attrs[:, 20:22] + vc * attrs[:, 22:24]
    tex = jax.lax.bitcast_convert_type(attrs[:, 24], jnp.int32)
    return p_off + n + jnp.pad(uv, ((0,0),(0,1))) + tex[:, None].astype(jnp.float32)

def interp_only(tri, o, d):
    attrs = scene.tri_attrs[tri]
    uc = o[:, 0:1]; vc = o[:, 1:2]
    b0 = jnp.float32(1.0) - uc - vc
    normals = attrs[:, 9:18].reshape(-1, 3, 3)
    n = b0 * normals[:, 0] + uc * normals[:, 1] + vc * normals[:, 2]
    uvs = attrs[:, 18:24].reshape(-1, 3, 2)
    uv = b0 * uvs[:, 0] + uc * uvs[:, 1] + vc * uvs[:, 2]
    return n + jnp.pad(uv, ((0,0),(0,1)))

def interp_flat(tri, o, d):
    attrs = scene.tri_attrs[tri]
    uc = o[:, 0:1]; vc = o[:, 1:2]
    b0 = jnp.float32(1.0) - uc - vc
    n = b0 * attrs[:, 9:12] + uc * attrs[:, 12:15] + vc * attrs[:, 15:18]
    uv = b0 * attrs[:, 18:20] + uc * attrs[:, 20:22] + vc * attrs[:, 22:24]
    return n + jnp.pad(uv, ((0,0),(0,1)))

timed("full", scan(full), tri0, o, d)
timed("full_flat", scan(full_flat), tri0, o, d)
timed("interp_only", scan(interp_only), tri0, o, d)
timed("interp_flat", scan(interp_flat), tri0, o, d)
