"""Sub-profile the shading block pieces on Duck 800x600 (480K lanes)."""
import os, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
import numpy as np
import jax, jax.numpy as jnp

from rayfinder_tpu.render.camera import create_camera, generate_camera_ray_lens
from rayfinder_tpu.render.scene import load_device_scene
from rayfinder_tpu.render.rng import blue_noise_tile, animated_blue_noise
from rayfinder_tpu.render.tiling import block_order
from rayfinder_tpu.sky.model import sky_state_from_ui, sky_radiance_dist
from rayfinder_tpu.render.pathtracer import _surface_interaction, SOLAR_COS_THETA_MAX
from rayfinder_tpu.render.texture_eval import eval_texture
from rayfinder_tpu.render.sampling import sample_solar_disk_direction, sample_cosine_hemisphere

W, H = 800, 600
REPS = 50

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
sun_dir = jnp.asarray(sky.sun_direction)
B = o.shape[0]
tri = (jnp.arange(B) % scene.tri_attrs.shape[0]).astype(jnp.int32)

fence = jax.jit(lambda a: jnp.sum(a))

def timed(name, fn, *args):
    r = fn(*args); float(fence(r))
    t0 = time.time(); r = fn(*args); float(fence(r))
    print(f"{name:12s} {(time.time()-t0)/REPS*1e3:8.3f} ms/iter")

def scan(body):
    @jax.jit
    def run(o, d, noise, tri):
        def step(c, _):
            o, d, noise, tri = c
            out = body(o, d, noise, tri)
            o = o + 1e-9 * out
            tri = (tri + 1) % scene.tri_attrs.shape[0]
            return (o, d, noise, tri), None
        c, _ = jax.lax.scan(step, (o, d, noise, tri), jnp.arange(REPS))
        return c[0]
    return run

def surf(o, d, noise, tri):
    p, n, uv, tex, _ = _surface_interaction(scene, o, d, tri)
    return p + n + jnp.pad(uv, ((0, 0), (0, 1)))

def texl(o, d, noise, tri):
    uv = jnp.stack([noise[:, 0], noise[:, 1]], -1)
    alb = eval_texture(scene, jnp.zeros_like(tri), uv)
    return alb

def skyf(o, d, noise, tri):
    theta = jnp.arccos(jnp.clip(d[:, 1], -1.0, 1.0))
    gamma = jnp.arccos(jnp.clip(jnp.sum(d * sun_dir, axis=-1), -1.0, 1.0))
    return sky_radiance_dist(sky, theta, gamma)

def sampl(o, d, noise, tri):
    light = sample_solar_disk_direction(noise, SOLAR_COS_THETA_MAX, sun_dir)
    wi = sample_cosine_hemisphere(noise, d)
    return light + wi

def prim(o, d, noise, tri):
    oo, dd = generate_camera_ray_lens(camera, noise, u, v)
    return oo + dd

timed("surface", scan(surf), o, d, noise, tri)
timed("texture", scan(texl), o, d, noise, tri)
timed("sky", scan(skyf), o, d, noise, tri)
timed("sampling", scan(sampl), o, d, noise, tri)
timed("primary", scan(prim), o, d, noise, tri)
