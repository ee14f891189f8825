"""Fused-path breakdown on Duck 800x600 64spp:
  kernel1   — one full-width pallas_trace_regen call from fresh state
              (consumes ALL consecutive miss samples = most of the image)
  live_after— live lanes after that call (phase-2 width check)
  shade61k  — one shading block at 61440 lanes
  full      — whole accumulate_samples_regen
"""
import sys; sys.path.insert(0, "/root/repo")
import os, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
import numpy as np
import jax, jax.numpy as jnp

from rayfinder_tpu.render.camera import create_camera
from rayfinder_tpu.render.scene import load_device_scene
from rayfinder_tpu.render.rng import blue_noise_tile, _A1, _A2
from rayfinder_tpu.render.tiling import block_order
from rayfinder_tpu.sky.model import sky_state_from_ui
from rayfinder_tpu.render.camera import generate_camera_ray_lens
from rayfinder_tpu.render.intersect import T_MAX
from rayfinder_tpu.ops.pallas_regen import pallas_trace_regen
import rayfinder_tpu.render.pathtracer as pt

W, H, NF = 800, 600, 64
scene = load_device_scene("/root/reference/assets/Duck.glb")
camera = create_camera([2.0, 1.5, 2.0], [0.1, 0.8, 0.0], 0.0, 1.0, 70.0, W / H)
sky = sky_state_from_ui(1.0, (1.0, 1.0, 1.0), 30.0, 0.0)
tile = jnp.asarray(blue_noise_tile())
fence = jax.jit(lambda a: jnp.sum(a))

ys_np, xs_np, _ = block_order(W, H)
ys, xs = jnp.asarray(ys_np), jnp.asarray(xs_np)
u = (xs.astype(jnp.float32) + 0.5) / W
v_tex = (ys.astype(jnp.float32) + 0.5) / H
B = u.shape[0]
nb = tile[ys % 128, xs % 128]
inv_dims = jnp.float32(1.0) / jnp.asarray([W, H], jnp.float32)

@jax.jit
def kernel1():
    sample = jnp.zeros((B,), jnp.int32)
    bounce = jnp.ones((B,), jnp.int32)
    noise0 = nb  # sample 0, frame_base 0 -> r2 = 0
    jit_uv = noise0 * inv_dims
    o0, d0 = generate_camera_ray_lens(camera, noise0, u + jit_uv[:, 0],
                                      (1.0 - v_tex) + jit_uv[:, 1])
    thr = jnp.ones((B, 3), jnp.float32)
    srad = jnp.zeros((B, 3), jnp.float32)
    lrad = jnp.zeros((B, 3), jnp.float32)
    out = pallas_trace_regen(scene, camera, sky, u, v_tex, nb, inv_dims,
                             jnp.int32(0), jnp.int32(256), jnp.int32(NF), T_MAX,
                             sample, bounce, o0, d0, thr, srad, lrad)
    return out[0], out[8]  # sample, tri

r = kernel1(); float(fence(r[0]))
t0 = time.time(); r = kernel1(); float(fence(r[0]))
print(f"kernel1 (full width, all miss samples): {time.time()-t0:.3f}s")
sample, tri = np.asarray(r[0]), np.asarray(r[1])
print("live after call 1:", int((sample < NF).sum()), "hits:", int((tri >= 0).sum()))

def run_full():
    accum = jnp.zeros((B, 3), jnp.float32)
    a = pt.accumulate_samples_regen(scene, sky, camera, tile, jnp.int32(0), accum,
        width=W, height=H, num_bounces=4, spp=256, num_frames=NF, engine="pallas")
    return a

a = run_full(); float(fence(a))
t0 = time.time(); a = run_full(); float(fence(a))
print(f"full: {time.time()-t0:.3f}s")
