"""Phase profile of the deferred hybrid frame (Duck 800x600): gbuffer /
lighting / resolve device time (fenced via scalar reduction) vs the
device->host image fetch. BASELINE.md records 322 ms/frame steady state;
this splits it. Usage: python -u prof/prof_deferred.py [frames=30]"""
import sys; sys.path.insert(0, "/root/repo")
import os, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
import numpy as np
import jax, jax.numpy as jnp

from rayfinder_tpu.render.camera import create_camera
from rayfinder_tpu.render.deferred import gbuffer_pass, lighting_pass, resolve_pass
from rayfinder_tpu.render.scene import load_device_scene
from rayfinder_tpu.sky.model import sky_state_from_ui

FRAMES = int(sys.argv[1]) if len(sys.argv) > 1 else 30
W, H = 800, 600
scene = load_device_scene("/root/reference/assets/Duck.glb")
camera = create_camera([2.0, 1.5, 2.0], [0.1, 0.8, 0.0], 0.0, 1.0, 70.0, W / H)
sky = sky_state_from_ui(1.0, (1.0, 1.0, 1.0), 30.0, 0.0)
fence = jax.jit(lambda a: jnp.sum(a))

accum = jnp.zeros((H * W, 3), jnp.float32)
# warm compiles
gbuf = gbuffer_pass(scene, camera, jnp.int32(0), width=W, height=H)
sample = lighting_pass(scene, sky, gbuf, jnp.int32(0), width=W, height=H)
accum, img = resolve_pass(sample, accum, jnp.int32(0), jnp.float32(0.25))
float(fence(img.astype(jnp.int32)))

tg = tl = tr = tf = 0.0
for fc in range(1, FRAMES + 1):
    f = jnp.int32(fc)
    t0 = time.time()
    gbuf = gbuffer_pass(scene, camera, f, width=W, height=H)
    float(fence(gbuf["depth"]))
    t1 = time.time()
    sample = lighting_pass(scene, sky, gbuf, f, width=W, height=H)
    float(fence(sample))
    t2 = time.time()
    accum, img = resolve_pass(sample, accum, f, jnp.float32(0.25))
    float(fence(img.astype(jnp.int32)))
    t3 = time.time()
    out = np.asarray(img)
    t4 = time.time()
    tg += t1 - t0; tl += t2 - t1; tr += t3 - t2; tf += t4 - t3
print(f"frames {FRAMES}: gbuffer {1000*tg/FRAMES:.1f} ms  "
      f"lighting {1000*tl/FRAMES:.1f} ms  resolve {1000*tr/FRAMES:.1f} ms  "
      f"FETCH {1000*tf/FRAMES:.1f} ms  "
      f"total {1000*(tg+tl+tr+tf)/FRAMES:.1f} ms/frame")
# (resolve_pass now emits u8 directly; FETCH above is the u8 fetch.)
