"""TPU validation: the grouped pallas walk must agree with the XLA wavefront
walk on a >512-cluster scene (grouped mode), including exact triangle
indices. This catches TPU-only gather inexactness that CPU interpret-mode
tests cannot see (Mosaic decomposes f32 matmuls into bf16 passes; the
original one-hot matmul-gather returned the right t but the WRONG triangle
for 97% of hits). Run on a real TPU; expect tri agreement ~1.0 (exact-t
ties may differ)."""
import os
import pathlib
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))

import numpy as np
import jax.numpy as jnp

from rayfinder_tpu.scene.procedural import courtyard_scene
from rayfinder_tpu.render.scene import build_device_scene
from rayfinder_tpu.ops.pallas_walk import pallas_intersect_closest, _grouped_mode
from rayfinder_tpu.render.wavefront import intersect_closest_wavefront

flat, textures = courtyard_scene(14)
scene = build_device_scene(flat, textures=textures)
print("clusters:", scene.cluster_tris.shape[0], "grouped:",
      _grouped_mode(scene.cluster_tris.shape[0]))
print("max cluster start:", int(jnp.max(scene.cluster_start)))

rng = np.random.default_rng(7)
n = 4096
o = np.stack([rng.uniform(-18, 18, n), rng.uniform(0.5, 10, n),
              rng.uniform(-9, 9, n)], axis=1).astype(np.float32)
d = rng.standard_normal((n, 3)).astype(np.float32)
d /= np.linalg.norm(d, axis=1, keepdims=True)

hit_p, t_p, tri_p = pallas_intersect_closest(
    scene, jnp.asarray(o), jnp.asarray(d), jnp.float32(1e4))
hit_w, t_w, tri_w, _ = intersect_closest_wavefront(
    scene, jnp.asarray(o), jnp.asarray(d), jnp.float32(1e4))

hp, hw = np.asarray(hit_p), np.asarray(hit_w)
tp, tw = np.asarray(t_p), np.asarray(t_w)
trip, triw = np.asarray(tri_p), np.asarray(tri_w)
print("hit agree:", (hp == hw).mean())
both = hp & hw
print("tri agree:", (trip[both] == triw[both]).mean())
dt = np.abs(tp[both] - tw[both])
print("max |t| diff:", dt.max() if both.any() else 0.0)
bad = both & (trip != triw)
print("bad count:", bad.sum())
if bad.any():
    i = np.argwhere(bad)[:5, 0]
    print("examples tri_p tri_w t_p t_w:")
    for j in i:
        print(" ", trip[j], triw[j], tp[j], tw[j])
