"""Cost of the cull-key sort components at bench width (262144 lanes),
rep-chained in single dispatches: the keycull kernel (pallas_nearest2),
the 32-column packed permute (vs the tri path's 23), and the composite.
Compare against prof_court_split's kernel 35.2 / sort 10.25 / shade 8.47.
"""
import sys; sys.path.insert(0, "/root/repo")
import os, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
import numpy as np
import jax, jax.numpy as jnp

from rayfinder_tpu.render.camera import create_camera, generate_camera_ray_lens
from rayfinder_tpu.render.scene import build_device_scene
from rayfinder_tpu.render.rng import blue_noise_tile
from rayfinder_tpu.render.tiling import block_order
from rayfinder_tpu.sky.model import sky_state_from_ui
from rayfinder_tpu.scene.procedural import courtyard_scene
from rayfinder_tpu.ops.pallas_keycull import (keycull_tables, pallas_nearest2,
                                              sort_key_from_keys)

W = H = 512
B = W * H
REPS = int(os.environ.get("REPS", "20"))
flat, textures = courtyard_scene(26)
scene = build_device_scene(flat, textures=textures)
camera = create_camera([-16.0, 5.0, 0.0], [12.0, 2.0, 0.0], 0.0, 1.0, 70.0, W / H)
tile = jnp.asarray(blue_noise_tile())
fence = jax.jit(lambda a: jnp.sum(a))

ys_np, xs_np, _ = block_order(W, H)
ys, xs = jnp.asarray(ys_np), jnp.asarray(xs_np)
u = (xs.astype(jnp.float32) + 0.5) / W
v_tex = (ys.astype(jnp.float32) + 0.5) / H
nb = tile[ys % 128, xs % 128]
inv_dims = jnp.float32(1.0) / jnp.asarray([W, H], jnp.float32)
o0, d0 = generate_camera_ray_lens(
    camera, nb, u + nb[:, 0] * inv_dims[0],
    (1.0 - v_tex) + nb[:, 1] * inv_dims[1])

kc = keycull_tables(scene)


def timed(name, fn, *args):
    r = fn(*args); float(fence(r))
    t0 = time.time()
    r = fn(*args); float(fence(r))
    dt = (time.time() - t0) / REPS * 1e3
    print(f"{name:10s} {dt:8.3f} ms/iter", flush=True)


@jax.jit
def keycull_only(o, d):
    def step(c, _):
        o_, d_ = c
        keys2 = pallas_nearest2(kc, o_, d_)
        key = sort_key_from_keys(keys2)
        # fold the key back so the scan has a data dependency
        o_ = o_ + (key[:, None] % 3).astype(jnp.float32) * 1e-9
        return (o_, d_), None
    c, _ = jax.lax.scan(step, (o, d), None, length=REPS)
    return c[0]


@jax.jit
def cullsort_only(o, d):
    z3 = jnp.zeros((B, 3), jnp.float32)
    st = (jnp.zeros((B,), jnp.int32), jnp.ones((B,), jnp.int32),
          jnp.zeros((B,), jnp.int32), o, d,
          jnp.ones((B, 3), jnp.float32), z3, z3, z3, z3, z3)

    def step(c, _):
        (sample, bounce, flag, origin, direction, thr, srad, lrad,
         sh_o, sh_d, contrib) = c
        key = (jax.lax.bitcast_convert_type(origin[:, 0], jnp.int32)
               & jnp.int32(0xFFFF))
        order = jnp.argsort(key, stable=True)
        packed = jnp.concatenate(
            [origin, direction, thr, srad, lrad, sh_o, sh_d, contrib,
             u[:, None], v_tex[:, None], nb], axis=1)[order]
        ints = jnp.stack([sample, bounce, flag, bounce], axis=1)[order]
        origin = packed[:, 0:3]; direction = packed[:, 3:6]
        thr = packed[:, 6:9]; srad = packed[:, 9:12]; lrad = packed[:, 12:15]
        sh_o = packed[:, 15:18]; sh_d = packed[:, 18:21]
        contrib = packed[:, 21:24]
        sample = ints[:, 0]; bounce = ints[:, 1]; flag = ints[:, 2]
        return (sample, bounce, flag, origin, direction, thr, srad, lrad,
                sh_o, sh_d, contrib), None
    c, _ = jax.lax.scan(step, st, None, length=REPS)
    return c[3]


timed("keycull", keycull_only, o0, d0)
timed("cullsort", cullsort_only, o0, d0)
