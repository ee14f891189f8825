"""Split the courtyard fused-regen outer iteration into components, each
rep-chained in one dispatch at the BENCH width (262144 lanes):

  kernel — pallas_trace_regen alone (trace + NEE occlusion + in-kernel regen)
  sort   — argsort by tri + the packed (B, 23) row gather
  shade  — _nee_and_continuation (surface gathers, texture, sampling)

Also prints the measured bench-equivalent total for context. Components
overlap with phase compaction in the real loop, so use relative shares.
"""
import sys; sys.path.insert(0, "/root/repo")
import os, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
import numpy as np
import jax, jax.numpy as jnp

from rayfinder_tpu.render.camera import create_camera
from rayfinder_tpu.render.scene import build_device_scene
from rayfinder_tpu.render.rng import blue_noise_tile, _A1, _A2
from rayfinder_tpu.render.tiling import block_order
from rayfinder_tpu.sky.model import sky_state_from_ui
from rayfinder_tpu.render.intersect import T_MAX
from rayfinder_tpu.ops.pallas_regen import pallas_trace_regen
from rayfinder_tpu.render.pathtracer import _nee_and_continuation
from rayfinder_tpu.scene.procedural import courtyard_scene

W = H = 512
B = W * H
REPS = int(os.environ.get("REPS", "10"))
NF = jnp.int32(16)
flat, textures = courtyard_scene(26)
scene = build_device_scene(flat, textures=textures)
camera = create_camera([-16.0, 5.0, 0.0], [12.0, 2.0, 0.0], 0.0, 1.0, 70.0, W / H)
sky = sky_state_from_ui(2.5, (0.3, 0.3, 0.3), 35.0, 25.0)
tile = jnp.asarray(blue_noise_tile())
fence = jax.jit(lambda a: jnp.sum(a))
sun_dir = jnp.asarray(sky.sun_direction)
solar_radiance = jnp.asarray(sky.solar_radiances)
park = jnp.asarray([1e30, 1e30, 1e30], jnp.float32)

ys_np, xs_np, _ = block_order(W, H)
ys, xs = jnp.asarray(ys_np), jnp.asarray(xs_np)
u = (xs.astype(jnp.float32) + 0.5) / W
v_tex = (ys.astype(jnp.float32) + 0.5) / H
nb = tile[ys % 128, xs % 128]
inv_dims = jnp.float32(1.0) / jnp.asarray([W, H], jnp.float32)
frame_base = jnp.int32(0)
spp = jnp.int32(256)

from rayfinder_tpu.render.camera import generate_camera_ray_lens
noise0 = nb
o0, d0 = generate_camera_ray_lens(
    camera, noise0, u + noise0[:, 0] * inv_dims[0],
    (1.0 - v_tex) + noise0[:, 1] * inv_dims[1])
z3 = jnp.zeros((B, 3), jnp.float32)
st0 = (jnp.zeros((B,), jnp.int32), jnp.ones((B,), jnp.int32),
       jnp.zeros((B,), jnp.int32), o0, d0,
       jnp.ones((B, 3), jnp.float32), z3, z3,
       jnp.broadcast_to(park, (B, 3)),
       jnp.broadcast_to(jnp.asarray([1.0, 0.0, 0.0], jnp.float32), (B, 3)), z3)


def timed(name, fn, *args):
    r = fn(*args); float(fence(r))
    t0 = time.time()
    r = fn(*args); float(fence(r))
    dt = (time.time() - t0) / REPS * 1e3
    print(f"{name:8s} {dt:8.2f} ms/iter", flush=True)


@jax.jit
def kernel_only(st):
    def step(c, _):
        (sample, bounce, flag, origin, direction, thr, srad, lrad,
         sh_o, sh_d, contrib) = c
        (sample, bounce, origin, direction, thr, srad, lrad, _t, tri
         ) = pallas_trace_regen(
            scene, camera, sky, u, v_tex, nb, inv_dims, frame_base,
            spp, NF, T_MAX,
            sample, bounce, flag, origin, direction, thr, srad, lrad,
            sh_o, sh_d, contrib)
        flag = jnp.where(tri >= 0, 1, 0).astype(jnp.int32)
        return (sample, bounce, flag, origin, direction, thr, srad, lrad,
                sh_o, sh_d, contrib), None
    c, _ = jax.lax.scan(step, st, None, length=REPS)
    return c[6]


@jax.jit
def sort_only(st):
    dead_key = jnp.int32(2**30)
    def step(c, _):
        (sample, bounce, flag, origin, direction, thr, srad, lrad,
         sh_o, sh_d, contrib) = c
        tri = flag * 7  # stand-in key
        live = sample < NF
        order = jnp.argsort(jnp.where(live, tri, dead_key), stable=True)
        packed = jnp.concatenate(
            [origin, direction, thr, srad, lrad, u[:, None], v_tex[:, None],
             nb,
             jax.lax.bitcast_convert_type(
                 jnp.stack([sample, bounce, tri, flag], axis=1), jnp.float32)],
            axis=1)[order]
        origin = packed[:, 0:3]
        direction = packed[:, 3:6]
        thr = packed[:, 6:9]
        srad = packed[:, 9:12]
        lrad = packed[:, 12:15]
        ints = jax.lax.bitcast_convert_type(packed[:, 19:23], jnp.int32)
        sample, bounce, tri2, flag = (ints[:, 0], ints[:, 1], ints[:, 2],
                                      ints[:, 3])
        return (sample, bounce, flag, origin, direction, thr, srad, lrad,
                sh_o, sh_d, contrib), None
    c, _ = jax.lax.scan(step, st, None, length=REPS)
    return c[3]


@jax.jit
def shade_only(st):
    def step(c, _):
        (sample, bounce, flag, origin, direction, thr, srad, lrad,
         sh_o, sh_d, contrib) = c
        live = sample < NF
        tri = jnp.where(flag > 0, bounce % scene.tri_attrs.shape[0], -1)
        n_ = (sample % spp).astype(jnp.float32)
        r2 = jnp.stack([_A1 * n_, _A2 * n_], axis=-1)
        noise = nb + (r2 - jnp.floor(r2))
        noise = noise - jnp.floor(noise)
        (flag, origin, direction, thr, bounce, sh_o, sh_d, contrib
         ) = _nee_and_continuation(
            scene, noise, origin, direction, tri, thr, bounce, live,
            sun_dir, solar_radiance, park, 4)
        return (sample, bounce, flag, origin, direction, thr, srad, lrad,
                sh_o, sh_d, contrib), None
    c, _ = jax.lax.scan(step, st, None, length=REPS)
    return c[5]


timed("sort", sort_only, st0)
timed("shade", shade_only, st0)
timed("kernel", kernel_only, st0)
