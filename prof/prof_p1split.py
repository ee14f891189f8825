"""Split a phase-1 regen iteration (49152 lanes, Duck bench config) into its
kernel and shade components, each chained in one lax.scan dispatch."""
import sys; sys.path.insert(0, "/root/repo")
import os, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
import numpy as np
import jax, jax.numpy as jnp
from functools import partial

from rayfinder_tpu.render.camera import create_camera, generate_camera_ray_lens
from rayfinder_tpu.render.scene import load_device_scene
from rayfinder_tpu.render.rng import blue_noise_tile, _A1, _A2
from rayfinder_tpu.render.tiling import block_order
from rayfinder_tpu.sky.model import sky_state_from_ui
from rayfinder_tpu.render.intersect import T_MAX
from rayfinder_tpu.ops.pallas_regen import pallas_trace_regen
from rayfinder_tpu.render.pathtracer import (
    _phase_sizes, _surface_interaction, SOLAR_COS_THETA_MAX, SOLAR_INV_PDF,
    FRAC_1_PI)
from rayfinder_tpu.render.texture_eval import eval_texture
from rayfinder_tpu.render.sampling import (
    sample_solar_disk_direction, sample_cosine_hemisphere)

W, H, NF = 800, 600, 64
P1 = 49152
REPS = 30
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


@jax.jit
def kernel_only(st):
    def step(c, _):
        (sample, bounce, flag, origin, direction, thr, srad, lrad,
         sh_o, sh_d, contrib) = c
        (sample, bounce, origin, direction, thr, srad, lrad, _t, tri
         ) = pallas_trace_regen(
            scene, camera, sky, u, v_tex, nb, inv_dims, frame_base,
            spp, nf, T_MAX,
            sample, bounce, flag, origin, direction, thr, srad, lrad,
            sh_o, sh_d, contrib)
        flag = jnp.where(tri >= 0, 1, 0).astype(jnp.int32)
        return (sample, bounce, flag, origin, direction, thr, srad, lrad,
                sh_o, sh_d, contrib), None
    c, _ = jax.lax.scan(step, st, None, length=REPS)
    return c[6]


@jax.jit
def shade_only(st):
    def step(c, _):
        (sample, bounce, flag, origin, direction, thr, srad, lrad,
         sh_o, sh_d, contrib) = c
        tri = flag  # stand-in per-lane tri index
        live = sample < nf
        hit = live & (tri >= 0)
        n_ = ((frame_base + sample) % spp).astype(jnp.float32)
        r2 = jnp.stack([_A1 * n_, _A2 * n_], axis=-1)
        noise = nb + (r2 - jnp.floor(r2))
        noise = noise - jnp.floor(noise)
        safe_tri = jnp.maximum(tri, 0)
        p, n, uv, tex, _ = _surface_interaction(scene, origin, direction, safe_tri)
        albedo = eval_texture(scene, tex, uv)
        light_dir = sample_solar_disk_direction(noise, SOLAR_COS_THETA_MAX, sun_dir)
        brdf = albedo * FRAC_1_PI
        cos_term = jnp.sum(n * light_dir, axis=-1, keepdims=True)
        p_ok = jnp.all(jnp.isfinite(p), axis=-1)
        sh_o = jnp.where((hit & p_ok)[:, None], p, park)
        sh_d = jnp.broadcast_to(light_dir, p.shape)
        contrib = thr * solar_radiance * brdf * cos_term * SOLAR_INV_PDF
        contrib = jnp.where(hit[:, None], contrib, jnp.float32(0.0))
        wi = sample_cosine_hemisphere(noise, n)
        ray_ok = jnp.all(jnp.isfinite(wi), axis=-1) & p_ok
        scatter = hit & (bounce < jnp.int32(4)) & ray_ok
        flag = jnp.where(hit, jnp.where(scatter, 1, 2), 0).astype(jnp.int32)
        origin = jnp.where(scatter[:, None], p, origin)
        direction = jnp.where(scatter[:, None], wi, direction)
        thr = jnp.where(scatter[:, None], thr * albedo, thr)
        bounce = jnp.where(scatter, bounce + 1, bounce)
        return (sample, bounce, flag, origin, direction, thr, srad, lrad,
                sh_o, sh_d, contrib), None
    c, _ = jax.lax.scan(step, st, None, length=REPS)
    return c[5]


for name, fn in [("kernel", kernel_only), ("shade", shade_only)]:
    r = fn(st0); float(fence(r))  # warm
    t0 = time.time()
    r = fn(st0); float(fence(r))
    dt = time.time() - t0
    print(f"{name:8s}: {dt/REPS*1e3:6.2f} ms/iter  ({dt:.3f}s / {REPS})",
          flush=True)
