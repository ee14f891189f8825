"""Time one pallas closest pass on the dumped courtyard ray sets
(/tmp/court_rays.npz), rep-chained in one dispatch. Env knobs (KRAYS etc.)
apply — run in separate processes to A/B kernel variants."""
import sys; sys.path.insert(0, "/root/repo")
import os, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
import numpy as np
import jax, jax.numpy as jnp

from rayfinder_tpu.ops.pallas_walk import pallas_intersect_closest, KRAYS
from rayfinder_tpu.render.scene import build_device_scene
from rayfinder_tpu.scene.procedural import courtyard_scene

REPS = int(os.environ.get("REPS", "20"))
TAGS = sys.argv[1:] or ["primary", "bounce1srt"]
fence = jax.jit(lambda a: jnp.sum(a))

flat, textures = courtyard_scene(26)
scene = build_device_scene(flat, textures=textures)
print("KRAYS", KRAYS)
z = np.load("/tmp/court_rays.npz")
for tag in TAGS:
    o = jnp.asarray(z[f"{tag}_o"])
    d = jnp.asarray(z[f"{tag}_d"])

    @jax.jit
    def run(o, d):
        def body(c, _):
            hit, t, tri = pallas_intersect_closest(scene, c[0], c[1],
                                                   jnp.float32(1e4))
            return (c[0] + 1e-7 * t[:, None], c[1]), None
        c, _ = jax.lax.scan(body, (o, d), None, length=REPS)
        return c[0]

    r = run(o, d); float(fence(r))
    t0 = time.time()
    r = run(o, d); float(fence(r))
    dt = (time.time() - t0) / REPS
    print(f"{tag:>12}: rays {o.shape[0]:7d}  {dt*1e3:7.2f} ms/pass "
          f"({o.shape[0]/dt/1e6:6.2f} Mrays/s)", flush=True)
