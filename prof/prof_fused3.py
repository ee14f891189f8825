"""Post-NEE-fusion per-iteration component costs at the phase-2 (61K-lane)
shape: the fused kernel WITH vs WITHOUT a pending NEE prologue, and the XLA
shade pass. Replaces prof_fused2.py (pre-fusion signature)."""
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
    flag = jnp.zeros((B,), jnp.int32)
    jit_uv = nb_full * inv_dims
    o0, d0 = generate_camera_ray_lens(camera, nb_full, u_full + jit_uv[:, 0],
                                      (1.0 - v_full) + jit_uv[:, 1])
    thr = jnp.ones((B, 3), jnp.float32)
    z3 = jnp.zeros((B, 3), jnp.float32)
    park = jnp.broadcast_to(jnp.asarray([1e30, 1e30, 1e30], jnp.float32), (B, 3))
    sd0 = jnp.broadcast_to(jnp.asarray([1.0, 0.0, 0.0], jnp.float32), (B, 3))
    st = pallas_trace_regen(scene, camera, sky, u_full, v_full, nb_full, inv_dims,
                            jnp.int32(0), jnp.int32(256), jnp.int32(NF), T_MAX,
                            sample, bounce, flag, o0, d0, thr, z3, z3,
                            park, sd0, z3)
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


# One shade step to produce realistic bounce-ray + NEE state.
@jax.jit
def shade(sample, o, d, thr, tri, nb_k):
    live = sample < NF
    hit = live & (tri >= 0)
    p, n, uv, tex, _ = _surface_interaction(scene, o, d, jnp.maximum(tri, 0))
    albedo = eval_texture(scene, tex, uv)
    light = sample_solar_disk_direction(nb_k, SOLAR_COS_THETA_MAX, sun_dir)
    wi = sample_cosine_hemisphere(nb_k, n)
    park = jnp.asarray([1e30, 1e30, 1e30], jnp.float32)
    p_ok = jnp.all(jnp.isfinite(p), axis=-1)
    sh_o = jnp.where((hit & p_ok)[:, None], p, park)
    sh_d = jnp.broadcast_to(light, p.shape)
    brdf = albedo * FRAC_1_PI
    cos_term = jnp.sum(n * light, axis=-1, keepdims=True)
    contrib = thr * brdf * cos_term * SOLAR_INV_PDF
    contrib = jnp.where(hit[:, None], contrib, 0.0)
    o2 = jnp.where(hit[:, None], p, park)
    d2 = jnp.where(hit[:, None], wi, d)
    return o2, d2, sh_o, sh_d, contrib


o2, d2, sh_o, sh_d, contrib = shade(sample, o, d, thr, tri, nb_k)
float(fence(o2))

REPS = 20
z3k = jnp.zeros((K, 3), jnp.float32)
parkk = jnp.broadcast_to(jnp.asarray([1e30, 1e30, 1e30], jnp.float32), (K, 3))
sd0k = jnp.broadcast_to(jnp.asarray([1.0, 0.0, 0.0], jnp.float32), (K, 3))


def make_kern(flag_val):
    @jax.jit
    def kern(sample, bounce, o, d, thr, nb_k, u_k, v_k, sh_o, sh_d, contrib):
        flag = jnp.full((K,), flag_val, jnp.int32)

        def body(c, _):
            o_c = c
            st = pallas_trace_regen(scene, camera, sky, u_k, v_k, nb_k, inv_dims,
                                    jnp.int32(0), jnp.int32(256), jnp.int32(NF),
                                    T_MAX, sample, bounce, flag, o_c, d, thr,
                                    z3k, z3k, sh_o, sh_d, contrib)
            return o_c + 0 * st[2], None
        c, _ = jax.lax.scan(body, o, jnp.arange(REPS))
        return c
    return kern


kern_nonee = make_kern(0)
kern_nee = make_kern(1)


@jax.jit
def shade_only(o, d, tri, nb_k, thr):
    def body(c, _):
        o, d = c
        o2, d2, sh_o, sh_d, contrib = shade.__wrapped__(sample, o, d, thr, tri, nb_k)
        return (o + 1e-9 * (o2 + sh_o + contrib), d), None
    c, _ = jax.lax.scan(body, (o, d), jnp.arange(REPS))
    return c[0]


def timed(name, fn, *args):
    r = fn(*args); float(fence(r))
    t0 = time.time(); r = fn(*args); float(fence(r))
    print(f"{name:26s} {(time.time()-t0)/REPS*1e3:8.3f} ms/iter")


timed("kernel, no pending NEE", kern_nonee, sample, bounce, o2, d2, thr,
      nb_k, u_k, v_k, parkk, sd0k, z3k)
timed("kernel, with pending NEE", kern_nee, sample, bounce, o2, d2, thr,
      nb_k, u_k, v_k, sh_o, sh_d, contrib)
timed("shade (XLA)", shade_only, o, d, tri, nb_k, thr)
