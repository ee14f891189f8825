"""Per-phase device cost of the fused regen loop (Duck bench config), one
dispatch per phase (reliable under degraded tunnel latency: only 3 dispatch
overheads total). Prints phase durations + iteration counts."""
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

W, H, NF = 800, 600, int(os.environ.get("PROF_NF", "64"))
BOUNCES = 4
scene = load_device_scene("/root/reference/assets/Duck.glb")
if os.environ.get("PROF_SKYCAM"):
    camera = create_camera([2.0, 1.5, 2.0], [2.0, 30.0, 2.0], 0.0, 1.0, 70.0, W / H)
else:
    camera = create_camera([2.0, 1.5, 2.0], [0.1, 0.8, 0.0], 0.0, 1.0, 70.0, W / H)
sky = sky_state_from_ui(1.0, (1.0, 1.0, 1.0), 30.0, 0.0)
tile = jnp.asarray(blue_noise_tile())
fence = jax.jit(lambda a: jnp.sum(a))
sun_dir = jnp.asarray(sky.sun_direction)
solar_radiance = jnp.asarray(sky.solar_radiances)
park = jnp.asarray([1e30, 1e30, 1e30], jnp.float32)

ys_np, xs_np, _ = block_order(W, H)
ys, xs = jnp.asarray(ys_np), jnp.asarray(xs_np)
u_full = (xs.astype(jnp.float32) + 0.5) / W
v_full = (ys.astype(jnp.float32) + 0.5) / H
B = u_full.shape[0]
nb_full = tile[ys % 128, xs % 128]
inv_dims = jnp.float32(1.0) / jnp.asarray([W, H], jnp.float32)
nf = jnp.int32(NF)
spp = jnp.int32(256)
frame_base = jnp.int32(0)


def noise_of(noise_base, sample_idx):
    n = ((frame_base + sample_idx) % spp).astype(jnp.float32)
    r2 = jnp.stack([_A1 * n, _A2 * n], axis=-1)
    r2 = r2 - jnp.floor(r2)
    out = noise_base + r2
    return out - jnp.floor(out)


def primary(u, v_tex, noise):
    jitter = noise * inv_dims
    return generate_camera_ray_lens(
        camera, noise, u + jitter[:, 0], (1.0 - v_tex) + jitter[:, 1])


def body_of(u, v_tex, noise_base, tile_override=None):
    def body(st):
        (sample, bounce, flag, origin, direction, thr, srad, lrad,
         sh_o, sh_d, contrib, it) = st
        (sample, bounce, origin, direction, thr, srad, lrad, _t, tri
         ) = pallas_trace_regen(
            scene, camera, sky, u, v_tex, noise_base, inv_dims, frame_base,
            spp, nf, T_MAX,
            sample, bounce, flag, origin, direction, thr, srad, lrad,
            sh_o, sh_d, contrib, tile_override=tile_override)
        live = sample < nf
        hit = live & (tri >= 0)
        noise = noise_of(noise_base, sample)
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
        scatter = hit & (bounce < jnp.int32(BOUNCES)) & ray_ok
        flag = jnp.where(hit, jnp.where(scatter, 1, 2), 0).astype(jnp.int32)
        origin = jnp.where(scatter[:, None], p, origin)
        direction = jnp.where(scatter[:, None], wi, direction)
        thr = jnp.where(scatter[:, None], thr * albedo, thr)
        bounce = jnp.where(scatter, bounce + 1, bounce)
        return (sample, bounce, flag, origin, direction, thr, srad, lrad,
                sh_o, sh_d, contrib, it + 1)
    return body


@partial(jax.jit, static_argnames=("size", "tile_override"))
def run_phase(u, v_tex, noise_base, st, size, tile_override=None):
    body = body_of(u, v_tex, noise_base, tile_override)

    def above(s):
        return jnp.sum((s[0] < nf).astype(jnp.int32)) > jnp.int32(size)

    return jax.lax.while_loop(above, body, st)


@partial(jax.jit, static_argnames=("size",))
def compact(u, v_tex, noise_base, st, size):
    sample = st[0]
    busy = sample < nf
    idx = jnp.nonzero(busy, size=size, fill_value=0)[0].astype(jnp.int32)
    valid = jnp.arange(size, dtype=jnp.int32) < jnp.sum(busy.astype(jnp.int32))
    take = lambda a: a[idx]
    new_sample = jnp.where(valid, take(sample), nf)
    return (take(u), take(v_tex), take(noise_base),
            (new_sample, take(st[1]), take(st[2]), take(st[3]), take(st[4]),
             take(st[5]), take(st[6]), jnp.zeros((size, 3), jnp.float32),
             take(st[8]), take(st[9]), take(st[10]), st[11]))


sample0 = jnp.zeros((B,), jnp.int32)
noise0 = noise_of(nb_full, sample0)
o0, d0 = primary(u_full, v_full, noise0)
z3 = jnp.zeros((B, 3), jnp.float32)
st = (sample0, jnp.ones((B,), jnp.int32), jnp.zeros((B,), jnp.int32), o0, d0,
      jnp.ones((B, 3), jnp.float32), z3, jnp.zeros((B, 3), jnp.float32),
      jnp.broadcast_to(park, (B, 3)),
      jnp.broadcast_to(jnp.asarray([1.0, 0.0, 0.0], jnp.float32), (B, 3)), z3,
      jnp.int32(0))

cur_u, cur_v, cur_nb = u_full, v_full, nb_full
sizes = _phase_sizes(B, int(os.environ.get("RAYFINDER_COMPACT_FLOOR", "4096")))
print("phases:", sizes, flush=True)

# Warm all compiles first (so timing loop is clean).
FT = int(os.environ.get("RAYFINDER_FULL_TILE", "1024"))
overrides = [(FT, 4096 // FT)] + [None] * len(sizes)
wu, wv, wn, wst = cur_u, cur_v, cur_nb, st
for size, ov in zip(sizes[1:] + [0], overrides):
    wst = run_phase(wu, wv, wn, wst, size, ov)
    float(fence(wst[7]))
    if size:
        wu, wv, wn, wst = compact(wu, wv, wn, wst, size)
print("warmed", flush=True)

it_prev = 0
for size, ov in zip(sizes[1:] + [0], overrides):
    t0 = time.time()
    st = run_phase(cur_u, cur_v, cur_nb, st, size, ov)
    float(fence(st[7]))
    dt = time.time() - t0
    iters = int(st[11]) - it_prev
    it_prev = int(st[11])
    wsize = st[0].shape[0]
    print(f"phase width {wsize:6d}: {iters:4d} iters  {dt:7.3f}s "
          f"({dt/max(iters,1)*1e3:6.2f} ms/iter)", flush=True)
    if size:
        cur_u, cur_v, cur_nb, st = compact(cur_u, cur_v, cur_nb, st, size)
print("total iters:", int(st[11]))
