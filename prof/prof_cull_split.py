"""In-context decomposition of the pairs cull: pallas kernel alone vs
kernel + XLA stage-2 (_cull_topw), scan-chained, on the dumped bounce1 set."""
import sys; sys.path.insert(0, "/root/repo")
import os, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
import numpy as np
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from rayfinder_tpu.ops import pallas_pairs as pp
from rayfinder_tpu.ops.pallas_walk import _pick_tile, _prep_rays, _full_spec
from rayfinder_tpu.render.scene import build_device_scene
from rayfinder_tpu.scene.procedural import courtyard_scene

REPS = 50
flat, textures = courtyard_scene(26)
scene = build_device_scene(flat, textures=textures)
z = np.load("/tmp/court_rays.npz")
o = jnp.asarray(z["bounce1srt_o"])
d = jnp.asarray(z["bounce1srt_d"])
n = o.shape[0]
tm = jnp.full((n,), 1e4, jnp.float32)
fence = jax.jit(lambda a: jnp.sum(a))
W1 = pp.PAIRS_W + 1

minsT, maxsT, _, c_pad = pp._pad_planes(scene)
tile, _ = _pick_tile(scene.cluster_tris.shape[0])
rt = pp._CULL_RT
rows = (c_pad // pp._SUBCH) * W1


def kernel_call(o, d, tm):
    op, dp, tmp, tiles, _ = _prep_rays(o, d, tm, tile, rt)
    return pl.pallas_call(
        pp._make_cull_kernel(c_pad, rt, W1, tile),
        grid=(tiles // rt,),
        in_specs=[
            pl.BlockSpec((rt, 3, tile), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((rt, 3, tile), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((rt, 1, tile), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            _full_spec(minsT.shape),
            _full_spec(maxsT.shape),
        ],
        out_specs=pl.BlockSpec(
            (rt, rows, tile), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((tiles, rows, tile), jnp.int32),
        interpret=pp._interpret(),
    )(op, dp, tmp, minsT, maxsT)


@jax.jit
def f_kernel(o, d, tm):
    def step(c, _):
        sub = kernel_call(o, d + c * jnp.float32(0.0), tm)
        return sub[0, 0, 0].astype(jnp.float32), None
    c, _ = jax.lax.scan(step, jnp.float32(0), None, length=REPS)
    return c


@jax.jit
def f_full(o, d, tm):
    def step(c, _):
        keys = pp._cull_topw(scene, o, d + c * jnp.float32(0.0), tm, W1)
        return keys[0, 0].astype(jnp.float32), None
    c, _ = jax.lax.scan(step, jnp.float32(0), None, length=REPS)
    return c


for name, fn in [("kernel", f_kernel), ("kernel+stage2", f_full)]:
    r = fn(o, d, tm); float(fence(r))
    t0 = time.time()
    r = fn(o, d, tm); float(fence(r))
    dt = time.time() - t0
    ntiles = -(-n // tile)
    print(f"{name:14s}: {dt/REPS*1e3:7.2f} ms/pass  "
          f"({dt/REPS/ntiles*1e6:5.2f} us/tile)", flush=True)
