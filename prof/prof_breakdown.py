"""Breakdown: where does a regen iteration spend its time on Duck 800x600?

Times, per iteration over 480K lanes:
  closest   — pallas_intersect_closest alone (chained in a scan)
  anyhit    — pallas_intersect_any alone
  shade     — the XLA shading block (gathers + sky + sampling), no traversal
  full      — one full regen-style body (closest + anyhit + shading)
"""
import os, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
import numpy as np
import jax, jax.numpy as jnp

from rayfinder_tpu.render.camera import create_camera, generate_camera_ray_lens
from rayfinder_tpu.render.scene import load_device_scene
from rayfinder_tpu.render.rng import blue_noise_tile, animated_blue_noise
from rayfinder_tpu.render.tiling import block_order
from rayfinder_tpu.sky.model import sky_state_from_ui, sky_radiance_dist
from rayfinder_tpu.ops.pallas_walk import pallas_intersect_closest, pallas_intersect_any
from rayfinder_tpu.render.pathtracer import _surface_interaction, SOLAR_COS_THETA_MAX
from rayfinder_tpu.render.texture_eval import eval_texture
from rayfinder_tpu.render.sampling import sample_solar_disk_direction, sample_cosine_hemisphere
from rayfinder_tpu.render.intersect import T_MAX

W, H = 800, 600
REPS = 20

scene = load_device_scene("/root/reference/assets/Duck.glb")
camera = create_camera([2.0, 1.5, 2.0], [0.1, 0.8, 0.0], 0.0, 1.0, 70.0, W / H)
sky = sky_state_from_ui(1.0, (1.0, 1.0, 1.0), 30.0, 0.0)
tile = jnp.asarray(blue_noise_tile())

ys_np, xs_np, _ = block_order(W, H)
ys, xs = jnp.asarray(ys_np), jnp.asarray(xs_np)
noise = animated_blue_noise(ys, xs, jnp.int32(0), jnp.int32(256), tile=tile)
u = (xs.astype(jnp.float32) + 0.5) / W
v = 1.0 - (ys.astype(jnp.float32) + 0.5) / H
o, d = generate_camera_ray_lens(camera, noise, u, v)

fence = jax.jit(lambda a: jnp.sum(a))

def timed(name, fn, *args):
    r = fn(*args)          # compile
    float(fence(r))
    t0 = time.time()
    r = fn(*args)
    float(fence(r))
    dt = (time.time() - t0) / REPS * 1e3
    print(f"{name:10s} {dt:8.2f} ms/iter")
    return dt

@jax.jit
def closest_only(o, d):
    def body(c, _):
        hit, t, tri = pallas_intersect_closest(scene, c[0], c[1], T_MAX)
        # perturb origin so iterations aren't identical
        c = (c[0] + 1e-7 * t[:, None], c[1])
        return c, None
    (o, d), _ = jax.lax.scan(body, (o, d), jnp.arange(REPS))
    return o

@jax.jit
def any_only(o, d):
    def body(c, _):
        occ = pallas_intersect_any(scene, c[0], c[1], T_MAX)
        c = (c[0] + 1e-7 * occ.astype(jnp.float32)[:, None], c[1])
        return c, None
    (o, d), _ = jax.lax.scan(body, (o, d), jnp.arange(REPS))
    return o

sun_dir = jnp.asarray(sky.sun_direction)

@jax.jit
def shade_only(o, d, noise):
    # hit everything with tri 0..N, skip traversal
    def body(c, _):
        o, d, noise = c
        tri = (jnp.arange(o.shape[0]) % scene.tri_attrs.shape[0]).astype(jnp.int32)
        theta = jnp.arccos(jnp.clip(d[:, 1], -1.0, 1.0))
        gamma = jnp.arccos(jnp.clip(jnp.sum(d * sun_dir, axis=-1), -1.0, 1.0))
        sky_rgb = sky_radiance_dist(sky, theta, gamma)
        p, n, uv, tex, _ = _surface_interaction(scene, o, d, tri)
        albedo = eval_texture(scene, tex, uv)
        light = sample_solar_disk_direction(noise, SOLAR_COS_THETA_MAX, sun_dir)
        wi = sample_cosine_hemisphere(noise, n)
        o = o + 1e-7 * (sky_rgb + albedo) + 1e-9 * (p + wi + light)
        return (o, d, noise), None
    c, _ = jax.lax.scan(body, (o, d, noise), jnp.arange(REPS))
    return c[0]

timed("closest", closest_only, o, d)
timed("anyhit", any_only, o, d)
timed("shade", shade_only, o, d, noise)
