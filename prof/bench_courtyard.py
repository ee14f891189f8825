"""Big-scene bench: courtyard 254K tris, one 512x512 window, 16 samples,
4 bounces, fused regen accumulator — single-dispatch timing (tunnel-safe).
Prints seconds + Mrays/s (EXACT ray accounting via the regen loop's
segment counters, same as bench.py)."""
import sys; sys.path.insert(0, "/root/repo")
import os, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
import numpy as np
import jax, jax.numpy as jnp

from rayfinder_tpu.render.camera import create_camera
from rayfinder_tpu.render.pathtracer import accumulate_samples_regen
from rayfinder_tpu.render.rng import blue_noise_tile
from rayfinder_tpu.render.scene import build_device_scene
from rayfinder_tpu.scene.procedural import courtyard_scene
from rayfinder_tpu.sky.model import sky_state_from_ui

W, H, NF, BOUNCES = 512, 512, int(os.environ.get("RAYFINDER_BENCH_SAMPLES", "16")), 4
flat, textures = courtyard_scene(
    26, textured=os.environ.get("RAYFINDER_COURT_TEXTURED") == "1")
scene = build_device_scene(flat, textures=textures)
print("tris:", flat.positions.shape[0], "clusters:", scene.cluster_tris.shape[0])
camera = create_camera([-16.0, 5.0, 0.0], [12.0, 2.0, 0.0], 0.0, 1.0, 70.0, W / H)
sky = sky_state_from_ui(2.5, (0.3, 0.3, 0.3), 35.0, 25.0)
tile = jnp.asarray(blue_noise_tile())
fence = jax.jit(lambda a: jnp.sum(a))


def step(fb, accum):
    return accumulate_samples_regen(
        scene, sky, camera, tile, jnp.int32(fb), accum,
        width=W, height=H, num_bounces=BOUNCES, spp=256, num_frames=NF,
        engine=os.environ.get("RAYFINDER_COURT_ENGINE", "pallas"),
        count_rays=True)


accum = jnp.zeros((W * H, 3), jnp.float32)
accum, _ = step(0, accum)
float(fence(accum))
t0 = time.time()
accum, rays = step(NF, accum)
float(fence(accum))
dt = time.time() - t0

closest, shadow = (int(x) for x in np.asarray(rays))
total = closest + shadow
print(f"rays {total} (closest {closest} shadow {shadow})  dt {dt:.3f}s  "
      f"{total/dt/1e6:.3f} Mrays/s")
