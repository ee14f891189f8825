"""What inside _surface_interaction costs 4.7ms? Piecewise timings."""
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
tri = jax.random.randint(key, (B,), 0, scene.tri_attrs.shape[0], dtype=jnp.int32)
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

def gather_only(tri, o, d):
    return scene.tri_attrs[tri].sum(axis=1)

def gather_mt(tri, o, d):
    attrs = scene.tri_attrs[tri]
    verts = attrs[:, 0:9].reshape(-1, 3, 3)
    v0, v1, v2 = verts[:, 0], verts[:, 1], verts[:, 2]
    _, t, u, v = ray_triangle(o, d, v0, v1, v2, jnp.float32(np.inf))
    return t[:, None] + u[:, None] + v[:, None]

def gather_mt_p(tri, o, d):
    attrs = scene.tri_attrs[tri]
    verts = attrs[:, 0:9].reshape(-1, 3, 3)
    v0, v1, v2 = verts[:, 0], verts[:, 1], verts[:, 2]
    _, t, u, v = ray_triangle(o, d, v0, v1, v2, jnp.float32(np.inf))
    e1 = v1 - v0; e2 = v2 - v0
    p = v0 + u[:, None] * e1 + v[:, None] * e2
    geo_n = jnp.cross(e1, e2)
    geo_n = geo_n / jnp.linalg.norm(geo_n, axis=-1, keepdims=True)
    return offset_ray(p, geo_n)

from rayfinder_tpu.render.pathtracer import _surface_interaction
def full(tri, o, d):
    p, n, uv, tex, t = _surface_interaction(scene, o, d, tri)
    return p + n + jnp.pad(uv, ((0,0),(0,1))) + tex[:, None].astype(jnp.float32)

timed("gather", scan(gather_only), tri, o, d)
timed("gather+mt", scan(gather_mt), tri, o, d)
timed("gather+mt+p", scan(gather_mt_p), tri, o, d)
timed("full", scan(full), tri, o, d)
