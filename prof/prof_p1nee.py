"""Phase-1 kernel cost with LIVE vs PARKED NEE (Duck bench shapes).

prof_p1split's kernel-only component feeds parked shadow rays (zero
contrib), so the in-kernel NEE prologue sweep is free there; the real
phase-1 iteration carries ~live-count pending shadow rays. This harness
builds a REAL mid-phase-1 state (3 outer iterations of the fused body at
49152 lanes), then scan-chains the kernel on that frozen state twice:

  live   — state as produced (pending NEE resolves every iteration)
  parked — same state with contrib zeroed (the NEE sweep early-exits)

delta = the in-context cost of the NEE occlusion sweep per iteration.
Run with RAYFINDER_PAIR=1 to measure the fused pair-sweep variant (the env
is read at rayfinder_tpu.ops.pallas_regen import time).
"""
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
from rayfinder_tpu.ops.pallas_regen import pallas_trace_regen, _PAIR
from rayfinder_tpu.render.pathtracer import _nee_and_continuation
from rayfinder_tpu.render.rng import _A1, _A2

W, H, NF = 800, 600, 64
P1 = 49152
REPS = int(os.environ.get("REPS", "30"))
scene = load_device_scene("/root/reference/assets/Duck.glb")
camera = create_camera([2.0, 1.5, 2.0], [0.1, 0.8, 0.0], 0.0, 1.0, 70.0, W / H)
sky = sky_state_from_ui(1.0, (1.0, 1.0, 1.0), 30.0, 0.0)
tile = jnp.asarray(blue_noise_tile())
fence = jax.jit(lambda a: jnp.sum(a))
sun_dir = jnp.asarray(sky.sun_direction)
solar_radiance = jnp.asarray(sky.solar_radiances)
park = jnp.asarray([1e30, 1e30, 1e30], jnp.float32)

ys_np, xs_np, _ = block_order(W, H)
# Phase-1 lanes are the still-busy (hit-region) pixels after compaction —
# the first P1 block-order pixels are pure sky and die in one call. Pick
# the first P1 pixels whose primary ray HITS (plus filler), like the real
# compaction does.
from rayfinder_tpu.render.wavefront import intersect_closest_wavefront
_u = (xs_np.astype(np.float32) + 0.5) / W
_v = 1.0 - (ys_np.astype(np.float32) + 0.5) / H
_o, _d = generate_camera_ray_lens(
    create_camera([2.0, 1.5, 2.0], [0.1, 0.8, 0.0], 0.0, 1.0, 70.0, W / H),
    jnp.zeros((W * H, 2), jnp.float32), jnp.asarray(_u), jnp.asarray(_v))
_hit, _, _, _ = intersect_closest_wavefront(
    load_device_scene("/root/reference/assets/Duck.glb"), _o, _d,
    jnp.float32(1e4))
_hit = np.asarray(_hit)
_idx = np.concatenate([np.nonzero(_hit)[0], np.nonzero(~_hit)[0]])[:P1]
_idx.sort()  # keep block-major coherence
ys, xs = jnp.asarray(ys_np)[_idx], jnp.asarray(xs_np)[_idx]
u = (xs.astype(jnp.float32) + 0.5) / W
v_tex = (ys.astype(jnp.float32) + 0.5) / H
nb = tile[ys % 128, xs % 128]
inv_dims = jnp.float32(1.0) / jnp.asarray([W, H], jnp.float32)
nf = jnp.int32(NF)
spp = jnp.int32(256)
frame_base = jnp.int32(0)
B = P1


def noise_of(sample):
    n_ = ((frame_base + sample) % spp).astype(jnp.float32)
    r2 = jnp.stack([_A1 * n_, _A2 * n_], axis=-1)
    out = nb + (r2 - jnp.floor(r2))
    return out - jnp.floor(out)


def body(st):
    (sample, bounce, flag, origin, direction, thr, srad, lrad,
     sh_o, sh_d, contrib) = st
    (sample, bounce, origin, direction, thr, srad, lrad, _t, tri
     ) = pallas_trace_regen(
        scene, camera, sky, u, v_tex, nb, inv_dims, frame_base,
        spp, nf, T_MAX,
        sample, bounce, flag, origin, direction, thr, srad, lrad,
        sh_o, sh_d, contrib)
    live = sample < nf
    noise = noise_of(sample)
    (flag, origin, direction, thr, bounce, sh_o, sh_d, contrib
     ) = _nee_and_continuation(
        scene, noise, origin, direction, tri, thr, bounce, live,
        sun_dir, solar_radiance, park, 4)
    return (sample, bounce, flag, origin, direction, thr, srad, lrad,
            sh_o, sh_d, contrib)


noise0 = noise_of(jnp.zeros((B,), jnp.int32))
o0, d0 = generate_camera_ray_lens(
    camera, noise0, u + noise0[:, 0] * inv_dims[0],
    (1.0 - v_tex) + noise0[:, 1] * inv_dims[1])
z3 = jnp.zeros((B, 3), jnp.float32)
st = (jnp.zeros((B,), jnp.int32), jnp.ones((B,), jnp.int32),
      jnp.zeros((B,), jnp.int32), o0, d0,
      jnp.ones((B, 3), jnp.float32), z3, z3,
      jnp.broadcast_to(park, (B, 3)),
      jnp.broadcast_to(jnp.asarray([1.0, 0.0, 0.0], jnp.float32), (B, 3)), z3)

warm3 = jax.jit(lambda st: body(body(body(st))))
st = warm3(st)
live_n = int(jnp.sum((st[0] < nf).astype(jnp.int32)))
nee_n = int(jnp.sum(((st[0] < nf) & (st[2] > 0)).astype(jnp.int32)))
print(f"state: {live_n} live lanes, {nee_n} pending NEE, pair={_PAIR}",
      flush=True)


@jax.jit
def kernel_reps(st, kill_nee):
    (sample, bounce, flag, origin, direction, thr, srad, lrad,
     sh_o, sh_d, contrib) = st
    contrib = contrib * jnp.where(kill_nee, 0.0, 1.0)

    def step(c, _):
        srad_c, lrad_c = c
        out = pallas_trace_regen(
            scene, camera, sky, u, v_tex, nb, inv_dims, frame_base,
            spp, nf, T_MAX,
            sample, bounce, flag, origin, direction, thr, srad_c, lrad_c,
            sh_o, sh_d, contrib)
        return (out[5], out[6]), None

    (srad_c, lrad_c), _ = jax.lax.scan(step, (srad, lrad), None, length=REPS)
    return lrad_c


for name, kill in (("parked", True), ("live", False)):
    r = kernel_reps(st, jnp.bool_(kill)); float(fence(r))  # warm
    t0 = time.time()
    r = kernel_reps(st, jnp.bool_(kill)); float(fence(r))
    dt = time.time() - t0
    print(f"kernel {name:6s}: {dt/REPS*1e3:6.2f} ms/iter ({dt:.3f}s/{REPS})",
          flush=True)
