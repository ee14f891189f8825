"""Phase-2 (61K-lane) per-iteration component costs in the fused loop."""
import sys; sys.path.insert(0, "/root/repo")
import os, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
import numpy as np
import jax, jax.numpy as jnp

from rayfinder_tpu.render.camera import create_camera, generate_camera_ray_lens
from rayfinder_tpu.render.scene import load_device_scene
from rayfinder_tpu.render.rng import blue_noise_tile
from rayfinder_tpu.render.tiling import block_order
from rayfinder_tpu.sky.model import sky_state_from_ui
from rayfinder_tpu.render.intersect import T_MAX
from rayfinder_tpu.ops.pallas_regen import pallas_trace_regen
from rayfinder_tpu.ops.pallas_walk import pallas_intersect_any
from rayfinder_tpu.render.pathtracer import (
    _surface_interaction, SOLAR_COS_THETA_MAX, SOLAR_INV_PDF, FRAC_1_PI)
from rayfinder_tpu.render.texture_eval import eval_texture
from rayfinder_tpu.render.sampling import (
    sample_solar_disk_direction, sample_cosine_hemisphere)

W, H, NF, K = 800, 600, 64, 61440
scene = load_device_scene("/root/reference/assets/Duck.glb")
camera = create_camera([2.0, 1.5, 2.0], [0.1, 0.8, 0.0], 0.0, 1.0, 70.0, W / H)
sky = sky_state_from_ui(1.0, (1.0, 1.0, 1.0), 30.0, 0.0)
tile = jnp.asarray(blue_noise_tile())
fence = jax.jit(lambda a: jnp.sum(a))
sun_dir = jnp.asarray(sky.sun_direction)

ys_np, xs_np, _ = block_order(W, H)
ys, xs = jnp.asarray(ys_np), jnp.asarray(xs_np)
u_full = (xs.astype(jnp.float32) + 0.5) / W
v_full = (ys.astype(jnp.float32) + 0.5) / H
B = u_full.shape[0]
nb_full = tile[ys % 128, xs % 128]
inv_dims = jnp.float32(1.0) / jnp.asarray([W, H], jnp.float32)

@jax.jit
def seed():
    sample = jnp.zeros((B,), jnp.int32)
    bounce = jnp.ones((B,), jnp.int32)
    jit_uv = nb_full * inv_dims
    o0, d0 = generate_camera_ray_lens(camera, nb_full, u_full + jit_uv[:, 0],
                                      (1.0 - v_full) + jit_uv[:, 1])
    thr = jnp.ones((B, 3), jnp.float32)
    z3 = jnp.zeros((B, 3), jnp.float32)
    st = pallas_trace_regen(scene, camera, sky, u_full, v_full, nb_full, inv_dims,
                            jnp.int32(0), jnp.int32(256), jnp.int32(NF), T_MAX,
                            sample, bounce, o0, d0, thr, z3, z3)
    sample, bounce, o, d, thr, srad, lrad, t, tri = st
    busy = sample < NF
    idx = jnp.nonzero(busy, size=K, fill_value=0)[0].astype(jnp.int32)
    valid = jnp.arange(K, dtype=jnp.int32) < jnp.sum(busy.astype(jnp.int32))
    g = lambda a: a[idx]
    return (jnp.where(valid, g(sample), NF), g(bounce), g(o), g(d), g(thr),
            g(srad), g(tri), g(u_full), g(v_full), g(nb_full))

S = seed()
S = jax.tree.map(lambda a: a.block_until_ready(), S)
sample, bounce, o, d, thr, srad, tri, u_k, v_k, nb_k = S
print("live in compact:", int(np.asarray((sample < NF)).sum()))

# one shade step to produce scatter rays (realistic bounce-ray state)
@jax.jit
def shade(sample, bounce, o, d, thr, srad, tri, nb_k):
    live = sample < NF
    hit = live & (tri >= 0)
    noise = nb_k  # approx
    p, n, uv, tex, _ = _surface_interaction(scene, o, d, jnp.maximum(tri, 0))
    albedo = eval_texture(scene, tex, uv)
    light = sample_solar_disk_direction(noise, SOLAR_COS_THETA_MAX, sun_dir)
    wi = sample_cosine_hemisphere(noise, n)
    park = jnp.asarray([1e30, 1e30, 1e30], jnp.float32)
    o2 = jnp.where(hit[:, None], p, park)
    d2 = jnp.where(hit[:, None], wi, d)
    return o2, d2, p, light, hit

o2, d2, p, light, hit = shade(sample, bounce, o, d, thr, srad, tri, nb_k)
float(fence(o2))

REPS = 20
@jax.jit
def kern_only(sample, bounce, o, d, thr, nb_k, u_k, v_k):
    z3 = jnp.zeros((K, 3), jnp.float32)
    def body(c, _):
        sample, bounce, o, d, thr = c
        st = pallas_trace_regen(scene, camera, sky, u_k, v_k, nb_k, inv_dims,
                                jnp.int32(0), jnp.int32(256), jnp.int32(NF), T_MAX,
                                sample, bounce, o, d, thr, z3, z3)
        # do NOT advance sample (repeatable): reuse inputs, consume outputs weakly
        return (sample, bounce, o + 0 * st[2], d, thr), None
    c, _ = jax.lax.scan(body, (sample, bounce, o, d, thr), jnp.arange(REPS))
    return c[2]

@jax.jit
def any_only(o2, light):
    def body(c, _):
        occ = pallas_intersect_any(scene, c, jnp.broadcast_to(light, c.shape), T_MAX)
        return c + 0 * occ.astype(jnp.float32)[:, None], None
    c, _ = jax.lax.scan(body, o2, jnp.arange(REPS))
    return c

@jax.jit
def shade_only(o, d, tri, nb_k):
    def body(c, _):
        o, d = c
        pp, n, uv, tex, _ = _surface_interaction(scene, o, d, jnp.maximum(tri, 0))
        albedo = eval_texture(scene, tex, uv)
        light = sample_solar_disk_direction(nb_k, SOLAR_COS_THETA_MAX, sun_dir)
        wi = sample_cosine_hemisphere(nb_k, n)
        return (o + 1e-9 * (pp + wi + light + albedo), d), None
    c, _ = jax.lax.scan(body, (o, d), jnp.arange(REPS))
    return c[0]

def timed(name, fn, *args):
    r = fn(*args); float(fence(r))
    t0 = time.time(); r = fn(*args); float(fence(r))
    print(f"{name:22s} {(time.time()-t0)/REPS*1e3:8.3f} ms/iter")

timed("kernel (bounce rays)", kern_only, sample, bounce, o2, d2, thr, nb_k, u_k, v_k)
timed("anyhit (shadow)", any_only, o2, light)
timed("shade", shade_only, o, d, tri, nb_k)
