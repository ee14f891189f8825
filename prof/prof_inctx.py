"""In-context A/B: bench the regen loop with pieces neutered to see real
in-loop costs (shadow pass, closest pass, shading gathers)."""
import os, sys, json, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
import numpy as np
import jax, jax.numpy as jnp

mode = sys.argv[1]  # full | noshadow | noclosest

import rayfinder_tpu.render.pathtracer as pt
real_get_engine = pt.get_engine

def patched(engine):
    closest, any_hit = real_get_engine(engine)
    if mode == "noshadow":
        def any2(s, o, d, tm):
            return jnp.zeros((o.shape[0],), jnp.bool_)
        return closest, any2
    if mode == "nosurface":
        return closest, any_hit  # handled below
    return closest, any_hit

pt.get_engine = patched

if mode == "nosurface":
    real_si = pt._surface_interaction
    def fake_si(scene, o, d, tri):
        # constant-ish surface: no gather, keeps shapes/dtypes
        p = o + d
        n = d
        uv = o[:, :2]
        tex = jnp.zeros((o.shape[0],), jnp.int32)
        t = jnp.ones((o.shape[0],), jnp.float32)
        return p, n, uv, tex, t
    pt._surface_interaction = fake_si

from rayfinder_tpu.render.camera import create_camera
from rayfinder_tpu.render.scene import load_device_scene
from rayfinder_tpu.render.rng import blue_noise_tile
from rayfinder_tpu.sky.model import sky_state_from_ui

W, H, B = 800, 600, 4
N = 64
scene = load_device_scene("/root/reference/assets/Duck.glb")
camera = create_camera([2.0, 1.5, 2.0], [0.1, 0.8, 0.0], 0.0, 1.0, 70.0, W / H)
sky = sky_state_from_ui(1.0, (1.0, 1.0, 1.0), 30.0, 0.0)
tile = jnp.asarray(blue_noise_tile())
accum = jnp.zeros((W * H, 3), jnp.float32)
fence = jax.jit(lambda a: jnp.sum(a))

def step(fb, a):
    return pt.accumulate_samples_regen(
        scene, sky, camera, tile, jnp.int32(fb), a,
        width=W, height=H, num_bounces=4, spp=256, num_frames=N, engine="pallas")

accum = step(0, accum); float(fence(accum))
t0 = time.time()
accum = step(N, accum); float(fence(accum))
print(json.dumps({"mode": mode, "dt_s": round(time.time() - t0, 3)}))
