"""Courtyard in-context component shares, by neutering one piece at a time
(diagnostic only — physics-wrong in neutered modes):

  full      — as shipped
  nonee     — zero the NEE contribution before the kernel (the in-kernel
              occlusion sweep then parks every lane: measures the NEE share)
  nosurface — replace the shade pass's HBM gathers (surface attrs + texels)
              with arithmetic fakes (measures the gather share)

Usage: python prof/diag_court.py [full|nonee|nosurface]
"""
import sys; sys.path.insert(0, "/root/repo")
import os, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
import numpy as np
import jax, jax.numpy as jnp

mode = sys.argv[1] if len(sys.argv) > 1 else "full"

import rayfinder_tpu.ops.pallas_regen as pr
import rayfinder_tpu.render.pathtracer as pt

if mode == "nonee":
    real_trace = pr.pallas_trace_regen

    def no_nee_trace(scene, camera, sky, u, v_tex, noise_base, inv_dims,
                     frame_base, spp_dyn, num_frames_dyn, t_max,
                     sample, bounce, flag, origin, direction, thr, srad, lrad,
                     shadow_o, shadow_d, contrib, tile_override=None):
        return real_trace(scene, camera, sky, u, v_tex, noise_base, inv_dims,
                          frame_base, spp_dyn, num_frames_dyn, t_max,
                          sample, bounce, flag, origin, direction, thr, srad,
                          lrad, shadow_o, shadow_d, jnp.zeros_like(contrib),
                          tile_override=tile_override)

    pr.pallas_trace_regen = no_nee_trace

if mode == "nosurface":
    def fake_si(scene, o, d, tri):
        p = o + d
        n = d
        uv = o[:, :2]
        tex = jnp.zeros((o.shape[0],), jnp.int32)
        t = jnp.ones((o.shape[0],), jnp.float32)
        return p, n, uv, tex, t

    def fake_tex(scene, tex, uv):
        return jnp.ones((uv.shape[0], 3), jnp.float32) * 0.5

    pt._surface_interaction = fake_si
    pt.eval_texture = fake_tex

from rayfinder_tpu.render.camera import create_camera
from rayfinder_tpu.render.pathtracer import accumulate_samples_regen
from rayfinder_tpu.render.rng import blue_noise_tile
from rayfinder_tpu.render.scene import build_device_scene
from rayfinder_tpu.scene.procedural import courtyard_scene
from rayfinder_tpu.sky.model import sky_state_from_ui

W, H, NF, BOUNCES = 512, 512, 16, 4
flat, textures = courtyard_scene(26)
scene = build_device_scene(flat, textures=textures)
camera = create_camera([-16.0, 5.0, 0.0], [12.0, 2.0, 0.0], 0.0, 1.0, 70.0, W / H)
sky = sky_state_from_ui(2.5, (0.3, 0.3, 0.3), 35.0, 25.0)
tile = jnp.asarray(blue_noise_tile())
fence = jax.jit(lambda a: jnp.sum(a))


def step(fb, accum):
    return accumulate_samples_regen(
        scene, sky, camera, tile, jnp.int32(fb), accum,
        width=W, height=H, num_bounces=BOUNCES, spp=256, num_frames=NF,
        engine="pallas")


accum = jnp.zeros((W * H, 3), jnp.float32)
accum = step(0, accum)
float(fence(accum))
t0 = time.time()
accum = step(NF, accum)
float(fence(accum))
print(f"{mode}: {time.time() - t0:.3f}s")
