"""TPU exactness check for the pairs engine: closest + any-hit agreement
with the production pallas sweep on the dumped courtyard ray sets
(CPU interpret mode cannot catch TPU lowering surprises — run this after
any pairs-kernel change, like prof/check_grouped_exact.py for the
grouped sweeps)."""
import sys; sys.path.insert(0, "/root/repo")
import os
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
import numpy as np
import jax.numpy as jnp

from rayfinder_tpu.ops.pallas_pairs import (pairs_intersect_any,
                                            pairs_intersect_closest)
from rayfinder_tpu.ops.pallas_walk import (pallas_intersect_any,
                                           pallas_intersect_closest)
from rayfinder_tpu.render.scene import build_device_scene
from rayfinder_tpu.scene.procedural import courtyard_scene

flat, textures = courtyard_scene(26)
scene = build_device_scene(flat, textures=textures)
z = np.load("/tmp/court_rays.npz")

ok = True
for tag in ("primary", "bounce1srt", "bounce2srt"):
    o = jnp.asarray(z[f"{tag}_o"])
    d = jnp.asarray(z[f"{tag}_d"])
    ph, pt, ptri = pallas_intersect_closest(scene, o, d, jnp.float32(1e4))
    qh, qt, qtri, tail = pairs_intersect_closest(scene, o, d, jnp.float32(1e4))
    ph, pt, ptri = np.asarray(ph), np.asarray(pt), np.asarray(ptri)
    qh, qt, qtri = np.asarray(qh), np.asarray(qt), np.asarray(qtri)
    hit_eq = (ph == qh).mean()
    t_ok = np.allclose(qt[ph & qh], pt[ph & qh], rtol=2e-6, atol=1e-6)
    tri_eq = (ptri[ph & qh] == qtri[ph & qh]).mean()
    pocc = np.asarray(pallas_intersect_any(scene, o, d, jnp.float32(1e4)))
    qocc, atail = pairs_intersect_any(scene, o, d, jnp.float32(1e4))
    occ_eq = (pocc == np.asarray(qocc)).mean()
    print(f"{tag:>12}: hit agree {hit_eq:.6f} t ok {t_ok} "
          f"tri agree {tri_eq:.6f} occ agree {occ_eq:.6f} "
          f"tail {int(tail)}/{int(atail)}", flush=True)
    ok &= hit_eq == 1.0 and t_ok and tri_eq > 0.99 and occ_eq == 1.0
print("PASS" if ok else "FAIL")
