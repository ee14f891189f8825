"""Time ONE bare pallas_trace_regen call at full width (pure-sky camera,
Duck tables, production phase-0 config: tile_override=(1024, 4)) at two NF
values — isolates the production kernel's per-round cost from the XLA shade
and phase machinery."""
import sys; sys.path.insert(0, "/root/repo")
import os, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
import numpy as np
import jax, jax.numpy as jnp

from rayfinder_tpu.render.camera import create_camera, generate_camera_ray_lens
from rayfinder_tpu.render.scene import load_device_scene
from rayfinder_tpu.render.rng import blue_noise_tile, animated_blue_noise
from rayfinder_tpu.render.tiling import block_order
from rayfinder_tpu.sky.model import sky_state_from_ui
from rayfinder_tpu.render.intersect import T_MAX
from rayfinder_tpu.ops.pallas_regen import pallas_trace_regen

W, H = 800, 600
scene = load_device_scene("/root/reference/assets/Duck.glb")
camera = create_camera([2.0, 1.5, 2.0], [2.0, 30.0, 2.0], 0.0, 1.0, 70.0, W / H)
sky = sky_state_from_ui(1.0, (1.0, 1.0, 1.0), 30.0, 0.0)
tile = jnp.asarray(blue_noise_tile())
fence = jax.jit(lambda a: jnp.sum(a))

ys_np, xs_np, _ = block_order(W, H)
ys, xs = jnp.asarray(ys_np), jnp.asarray(xs_np)
u = (xs.astype(jnp.float32) + 0.5) / W
v_tex = (ys.astype(jnp.float32) + 0.5) / H
nb = tile[ys % 128, xs % 128]
inv_dims = jnp.float32(1.0) / jnp.asarray([W, H], jnp.float32)
B = u.shape[0]
noise0 = animated_blue_noise(ys, xs, jnp.int32(0), jnp.int32(256), tile=tile)
o0, d0 = generate_camera_ray_lens(
    camera, noise0, u + noise0[:, 0] * inv_dims[0],
    (1.0 - v_tex) + noise0[:, 1] * inv_dims[1])
z3 = jnp.zeros((B, 3), jnp.float32)
park = jnp.asarray([1e30, 1e30, 1e30], jnp.float32)

call = jax.jit(lambda nf, st: pallas_trace_regen(
    scene, camera, sky, u, v_tex, nb, inv_dims, jnp.int32(0),
    jnp.int32(256), nf, T_MAX, *st, tile_override=(1024, 4)))

st = (jnp.zeros((B,), jnp.int32), jnp.ones((B,), jnp.int32),
      jnp.zeros((B,), jnp.int32), o0, d0, jnp.ones((B, 3), jnp.float32),
      z3, z3, jnp.broadcast_to(park, (B, 3)),
      jnp.broadcast_to(jnp.asarray([1.0, 0.0, 0.0], jnp.float32), (B, 3)), z3)

for nf in (8, 64):
    r = call(jnp.int32(nf), st); float(fence(r[6]))  # warm
    t0 = time.time()
    r = call(jnp.int32(nf), st); float(fence(r[6]))
    dt = time.time() - t0
    print(f"NF={nf:3d}: {dt*1e3:8.2f} ms", flush=True)
