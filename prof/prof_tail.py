"""Measure regen-loop occupancy: live-lane fraction per iteration, Duck 64spp.

Runs the exact accumulate_samples_regen body as a fixed-length scan and
records sum(live) each iteration.
"""
import os, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
import numpy as np
import jax, jax.numpy as jnp

from rayfinder_tpu.render.camera import create_camera
from rayfinder_tpu.render.scene import load_device_scene
from rayfinder_tpu.render.rng import blue_noise_tile
from rayfinder_tpu.sky.model import sky_state_from_ui
import rayfinder_tpu.render.pathtracer as pt

W, H = 800, 600
FRAMES = 64
BOUNCES = 4
MAXIT = 300

scene = load_device_scene("/root/reference/assets/Duck.glb")
camera = create_camera([2.0, 1.5, 2.0], [0.1, 0.8, 0.0], 0.0, 1.0, 70.0, W / H)
sky = sky_state_from_ui(1.0, (1.0, 1.0, 1.0), 30.0, 0.0)
tile = jnp.asarray(blue_noise_tile())

# Re-create the regen setup inline (mirrors accumulate_samples_regen).
from functools import partial
from rayfinder_tpu.render.camera import generate_camera_ray_lens
from rayfinder_tpu.render.tiling import block_order
from rayfinder_tpu.render.rng import _A1, _A2
from rayfinder_tpu.render.intersect import T_MAX

@partial(jax.jit, static_argnames=())
def occupancy():
    closest, any_hit = pt.get_engine("pallas")
    ys_np, xs_np, _ = block_order(W, H)
    ys = jnp.asarray(ys_np); xs = jnp.asarray(xs_np)
    u = (xs.astype(jnp.float32) + 0.5) / jnp.float32(W)
    v_tex = (ys.astype(jnp.float32) + 0.5) / jnp.float32(H)
    batch = u.shape[0]
    th, tw = tile.shape[0], tile.shape[1]
    noise_base = tile[ys % th, xs % tw]
    frame_base = jnp.int32(0)

    def noise_of(sample_idx):
        n = ((frame_base + sample_idx) % jnp.int32(256)).astype(jnp.float32)
        r2 = jnp.stack([_A1 * n, _A2 * n], axis=-1)
        r2 = r2 - jnp.floor(r2)
        out = noise_base + r2
        return out - jnp.floor(out)

    inv_dims = jnp.float32(1.0) / jnp.asarray([W, H], jnp.float32)
    def primary(noise):
        jitter = noise * inv_dims
        ray_u = u + jitter[:, 0]
        ray_v = (jnp.float32(1.0) - v_tex) + jitter[:, 1]
        return generate_camera_ray_lens(camera, noise, ray_u, ray_v)

    sun_dir = jnp.asarray(sky.sun_direction)
    solar_radiance = jnp.asarray(sky.solar_radiances)
    park = jnp.asarray([1e30, 1e30, 1e30], jnp.float32)
    sample0 = jnp.zeros((batch,), jnp.int32)
    noise0 = noise_of(sample0)
    o0, d0 = primary(noise0)
    accum = jnp.zeros((batch, 3), jnp.float32)
    st = (sample0, jnp.ones((batch,), jnp.int32), o0, d0,
          jnp.ones((batch, 3), jnp.float32), jnp.zeros((batch, 3), jnp.float32),
          accum, noise0)

    from rayfinder_tpu.render.pathtracer import (
        _surface_interaction, SOLAR_COS_THETA_MAX, SOLAR_INV_PDF, FRAC_1_PI)
    from rayfinder_tpu.render.texture_eval import eval_texture
    from rayfinder_tpu.render.sampling import (
        sample_solar_disk_direction, sample_cosine_hemisphere)
    from rayfinder_tpu.sky.model import sky_radiance_dist

    def body(st, _):
        sample, bounce, origin, direction, thr, srad, lrad, noise = st
        live = sample < jnp.int32(FRAMES)
        origin = jnp.where(live[:, None], origin, park)
        hit, _, tri_idx, _ = closest(scene, origin, direction, T_MAX)
        hit_lane = live & hit
        miss_lane = live & ~hit
        theta = jnp.arccos(jnp.clip(direction[:, 1], -1.0, 1.0))
        gamma = jnp.arccos(jnp.clip(jnp.sum(direction * sun_dir, axis=-1), -1.0, 1.0))
        sky_rgb = sky_radiance_dist(sky, theta, gamma)
        srad = jnp.where(miss_lane[:, None], srad + thr * sky_rgb, srad)
        safe_tri = jnp.maximum(tri_idx, 0)
        p, n, uv, tex, _ = _surface_interaction(scene, origin, direction, safe_tri)
        albedo = eval_texture(scene, tex, uv)
        light_dir = sample_solar_disk_direction(noise, SOLAR_COS_THETA_MAX, sun_dir)
        brdf = albedo * FRAC_1_PI
        cos_term = jnp.sum(n * light_dir, axis=-1, keepdims=True)
        p_ok = jnp.all(jnp.isfinite(p), axis=-1)
        shadow_origin = jnp.where((hit_lane & p_ok)[:, None], p, park)
        occluded = any_hit(scene, shadow_origin, jnp.broadcast_to(light_dir, p.shape), T_MAX)
        visibility = jnp.where(occluded, jnp.float32(0.0), jnp.float32(1.0))[:, None]
        contrib = thr * solar_radiance * brdf * cos_term * visibility * SOLAR_INV_PDF
        srad = jnp.where(hit_lane[:, None], srad + contrib, srad)
        wi = sample_cosine_hemisphere(noise, n)
        ray_ok = jnp.all(jnp.isfinite(wi), axis=-1) & p_ok
        scatter = hit_lane & (bounce < jnp.int32(BOUNCES)) & ray_ok
        term = live & ~scatter
        lrad = jnp.where(term[:, None], lrad + srad, lrad)
        srad = jnp.where(term[:, None], jnp.float32(0.0), srad)
        sample = jnp.where(term, sample + 1, sample)
        regen = term & (sample < jnp.int32(FRAMES))
        noise_new = noise_of(sample)
        po, pd = primary(noise_new)
        origin = jnp.where(scatter[:, None], p, jnp.where(regen[:, None], po, origin))
        direction = jnp.where(scatter[:, None], wi, jnp.where(regen[:, None], pd, direction))
        thr = jnp.where(scatter[:, None], thr * albedo,
                        jnp.where(regen[:, None], jnp.float32(1.0), thr))
        noise = jnp.where(regen[:, None], noise_new, noise)
        bounce = jnp.where(scatter, bounce + 1, jnp.where(regen, 1, bounce))
        st = (sample, bounce, origin, direction, thr, srad, lrad, noise)
        return st, jnp.sum(live.astype(jnp.int32))
    st, lives = jax.lax.scan(body, st, jnp.arange(MAXIT))
    return lives

t0 = time.time()
lives = np.asarray(occupancy())
print(f"total scan time {time.time()-t0:.1f}s (incl compile)")
B = 480000  # padded lanes 800*600
nz = lives[lives > 0]
print("iterations until empty:", len(nz))
print("sum(live)/B =", nz.sum() / B, "(= avg segments/lane)")
print("area under curve vs run-to-max:", nz.sum() / (len(nz) * B))
for i in range(0, len(nz), 10):
    print(f"it {i:4d}  live {nz[i]:7d}  ({nz[i]/B*100:5.1f}%)")
