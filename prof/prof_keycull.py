"""Cost of the sort-key cull (ops/pallas_keycull) at bench width: ms/pass
scan-chained at 262144 rays on the courtyard."""
import sys; sys.path.insert(0, "/root/repo")
import os, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
import numpy as np
import jax, jax.numpy as jnp

from rayfinder_tpu.ops.pallas_keycull import (keycull_tables, pallas_nearest2,
                                              sort_key_from_keys)
from rayfinder_tpu.render.scene import build_device_scene
from rayfinder_tpu.scene.procedural import courtyard_scene

REPS = 50
flat, textures = courtyard_scene(26)
scene = build_device_scene(flat, textures=textures)
tables = keycull_tables(scene)
z = np.load("/tmp/court_rays.npz")
o = jnp.asarray(z["primary_o"])
d = jnp.asarray(z["primary_d"])
n = o.shape[0]
fence = jax.jit(lambda a: jnp.sum(a))


@jax.jit
def f(o, d):
    def step(c, _):
        keys = pallas_nearest2(tables, o, d + c * jnp.float32(0.0))
        k = sort_key_from_keys(keys)
        return k[0].astype(jnp.float32), None
    c, _ = jax.lax.scan(step, jnp.float32(0), None, length=REPS)
    return c


r = f(o, d); float(fence(r))
t0 = time.time()
r = f(o, d); float(fence(r))
dt = time.time() - t0
print(f"keycull: {dt/REPS*1e3:6.2f} ms/pass ({dt/REPS/(n//128)*1e6:5.2f} us/tile)"
      f" at {n} rays", flush=True)

# sanity vs study: agreement of c0 with the full-cull nearest cluster
from rayfinder_tpu.ops import pallas_pairs as pp
keys2 = pallas_nearest2(tables, o[:32768], d[:32768])
full = pp._cull_topw(scene, o[:32768], d[:32768],
                     jnp.full((32768,), 1e4, jnp.float32), 2)
c0_fast = np.asarray(keys2[:, 0]) & 0x3FFF
c0_full = np.asarray(full[:, 0]) & 0xFFF
print("c0 agreement vs exact cull:", (c0_fast == c0_full).mean(), flush=True)
