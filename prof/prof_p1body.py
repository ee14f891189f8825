"""Where do phase-1's 6.17 ms/iter go beyond kernel 2.45 + shade 1.46
(prof_p1split)? Times the COMBINED body (kernel + real _nee_and_continuation)
under four loop mechanisms at 49152 lanes (Duck bench config):
  a) scan      — chained in lax.scan (no condition)
  b) while_cnt — lax.while_loop with a scalar-counter condition
  c) while_sum — lax.while_loop with the production live-count condition
  d) while_k4  — production condition checked every 4 iterations (scan of 4
                 bodies inside the while body)
(b)-(a) = while carry/plumbing cost, (c)-(b) = reduction-condition cost,
(d) shows what coarser condition checking would recover."""
import sys; sys.path.insert(0, "/root/repo")
import os, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
import numpy as np
import jax, jax.numpy as jnp

from rayfinder_tpu.render.camera import create_camera, generate_camera_ray_lens
from rayfinder_tpu.render.scene import load_device_scene
from rayfinder_tpu.render.rng import blue_noise_tile, _A1, _A2
from rayfinder_tpu.render.tiling import block_order
from rayfinder_tpu.sky.model import sky_state_from_ui
from rayfinder_tpu.render.intersect import T_MAX
from rayfinder_tpu.ops.pallas_regen import pallas_trace_regen
from rayfinder_tpu.render.pathtracer import _nee_and_continuation

W, H, NF = 800, 600, 64
P1 = 49152
REPS = 32
scene = load_device_scene("/root/reference/assets/Duck.glb")
camera = create_camera([2.0, 1.5, 2.0], [0.1, 0.8, 0.0], 0.0, 1.0, 70.0, W / H)
sky = sky_state_from_ui(1.0, (1.0, 1.0, 1.0), 30.0, 0.0)
tile = jnp.asarray(blue_noise_tile())
fence = jax.jit(lambda a: jnp.sum(a))
sun_dir = jnp.asarray(sky.sun_direction)
solar_radiance = jnp.asarray(sky.solar_radiances)
park = jnp.asarray([1e30, 1e30, 1e30], jnp.float32)

ys_np, xs_np, _ = block_order(W, H)
ys, xs = jnp.asarray(ys_np)[:P1], jnp.asarray(xs_np)[:P1]
u = (xs.astype(jnp.float32) + 0.5) / W
v_tex = (ys.astype(jnp.float32) + 0.5) / H
nb = tile[ys % 128, xs % 128]
inv_dims = jnp.float32(1.0) / jnp.asarray([W, H], jnp.float32)
nf = jnp.int32(NF)
spp = jnp.int32(256)
frame_base = jnp.int32(0)
B = P1

noise0 = nb
o0, d0 = generate_camera_ray_lens(
    camera, noise0, u + noise0[:, 0] * inv_dims[0],
    (1.0 - v_tex) + noise0[:, 1] * inv_dims[1])
z3 = jnp.zeros((B, 3), jnp.float32)
sample0 = jnp.zeros((B,), jnp.int32)
st0 = (sample0, jnp.ones((B,), jnp.int32), jnp.zeros((B,), jnp.int32), o0, d0,
       jnp.ones((B, 3), jnp.float32), z3, z3,
       jnp.broadcast_to(park, (B, 3)),
       jnp.broadcast_to(jnp.asarray([1.0, 0.0, 0.0], jnp.float32), (B, 3)), z3)


def body(c):
    (sample, bounce, flag, origin, direction, thr, srad, lrad,
     sh_o, sh_d, contrib) = c
    (sample, bounce, origin, direction, thr, srad, lrad, _t, tri
     ) = pallas_trace_regen(
        scene, camera, sky, u, v_tex, nb, inv_dims, frame_base,
        spp, nf, T_MAX,
        sample, bounce, flag, origin, direction, thr, srad, lrad,
        sh_o, sh_d, contrib)
    live = sample < nf
    n_ = ((frame_base + sample) % spp).astype(jnp.float32)
    r2 = jnp.stack([_A1 * n_, _A2 * n_], axis=-1)
    noise = nb + (r2 - jnp.floor(r2))
    noise = noise - jnp.floor(noise)
    (flag, origin, direction, thr, bounce, sh_o, sh_d, contrib
     ) = _nee_and_continuation(
        scene, noise, origin, direction, tri, thr, bounce, live,
        sun_dir, solar_radiance, park, 4)
    return (sample, bounce, flag, origin, direction, thr, srad, lrad,
            sh_o, sh_d, contrib)


@jax.jit
def f_scan(st):
    c, _ = jax.lax.scan(lambda c, _: (body(c), None), st, None, length=REPS)
    return c[7]


@jax.jit
def f_while_cnt(st):
    def cond(s):
        return s[0] < REPS
    def b(s):
        return (s[0] + 1, body(s[1]))
    _, c = jax.lax.while_loop(cond, b, (jnp.int32(0), st))
    return c[7]


@jax.jit
def f_while_sum(st):
    # Production condition shape; the threshold (-1) never triggers so the
    # loop runs until the counter stops it (counter rides along for that).
    def cond(s):
        live = jnp.sum((s[1][0] < nf).astype(jnp.int32))
        return (live > jnp.int32(-1)) & (s[0] < REPS)
    def b(s):
        return (s[0] + 1, body(s[1]))
    _, c = jax.lax.while_loop(cond, b, (jnp.int32(0), st))
    return c[7]


@jax.jit
def f_while_k4(st):
    def cond(s):
        live = jnp.sum((s[1][0] < nf).astype(jnp.int32))
        return (live > jnp.int32(-1)) & (s[0] < REPS)
    def b(s):
        c, _ = jax.lax.scan(lambda c, _: (body(c), None), s[1], None, length=4)
        return (s[0] + 4, c)
    _, c = jax.lax.while_loop(cond, b, (jnp.int32(0), st))
    return c[7]


for name, fn in [("scan", f_scan), ("while_cnt", f_while_cnt),
                 ("while_sum", f_while_sum), ("while_k4", f_while_k4)]:
    r = fn(st0); float(fence(r))  # warm
    t0 = time.time()
    r = fn(st0); float(fence(r))
    dt = time.time() - t0
    print(f"{name:10s}: {dt/REPS*1e3:6.2f} ms/iter  ({dt:.3f}s / {REPS})",
          flush=True)
