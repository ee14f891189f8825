"""Fit the grouped-sweep cost model on TPU: time pallas_intersect_closest on
ray sets with different (super-visit, inner-iteration) mixes — primaries,
raw bounce-1, sorted bounce-1, raw bounce-2 on the courtyard bench scene —
and least-squares solve

    t_set = a * sum(super_visits) + b * sum(inner_iters) + c * tiles

for a (per super visit: DMA + entry build + selection syncs), b (per inner
iteration: gather + MT + selection), c (fixed per tile-sweep). Counts come
from the counted diagnostic kernel (prof/diag_iters.py); timing uses the
PRODUCTION kernel, rep-chained in one lax.scan dispatch with a 1e-7 origin
perturbation (the prof_breakdown pattern).
"""
import sys; sys.path.insert(0, "/root/repo")
import os, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
import numpy as np
import jax, jax.numpy as jnp

from diag_iters import counted_closest
import rayfinder_tpu.ops.pallas_walk as pw
from rayfinder_tpu.ops.pallas_walk import pallas_intersect_closest
from rayfinder_tpu.render.camera import create_camera, generate_camera_ray
from rayfinder_tpu.render.scene import build_device_scene
from rayfinder_tpu.render.sampling import sample_cosine_hemisphere
from rayfinder_tpu.scene.procedural import courtyard_scene

REPS = int(os.environ.get("REPS", "20"))
T_MAX = jnp.float32(1e4)
fence = jax.jit(lambda a: jnp.sum(a))


def main():
    scale = int(sys.argv[1]) if len(sys.argv) > 1 else 26
    W = H = 512
    flat, textures = courtyard_scene(scale)
    scene = build_device_scene(flat, textures=textures)
    C = scene.cluster_tris.shape[0]
    print(f"tris {flat.positions.shape[0]} clusters {C} "
          f"supers {-(-C // pw.SUPER_G)}")
    camera = create_camera([-16.0, 5.0, 0.0], [12.0, 2.0, 0.0], 0.0, 1.0,
                           70.0, W / H)
    js, is_ = np.meshgrid(np.arange(W), np.arange(H), indexing="xy")
    u = (js.reshape(-1) + 0.5).astype(np.float32) / W
    v = 1.0 - (is_.reshape(-1) + 0.5).astype(np.float32) / H
    o, d = generate_camera_ray(camera, jnp.asarray(u), jnp.asarray(v))

    rng = np.random.default_rng(7)
    sp = np.asarray(scene.tri_positions)

    # --- build the ray sets exactly as diag_iters does (same seed) ---
    sets = {}

    def add(tag, o, d):
        hit, t, tri, sv, it = counted_closest(scene, o, d, T_MAX)
        sets[tag] = (o, d, int(jnp.sum(sv)), int(jnp.sum(it)), sv.shape[0])
        return hit, t, tri

    hit, t, tri = add("primary", o, d)
    on, dn = np.asarray(o), np.asarray(d)
    for bounce in (1, 2):
        hitn = np.asarray(hit)
        tn = np.asarray(t)[:, None]
        trin = np.maximum(np.asarray(tri), 0)
        p = on + tn * dn
        v0, v1, v2 = sp[trin, 0], sp[trin, 1], sp[trin, 2]
        gn = np.cross(v1 - v0, v2 - v0)
        gn /= np.maximum(np.linalg.norm(gn, axis=1, keepdims=True), 1e-12)
        gn = np.where((np.einsum("ij,ij->i", gn, dn) > 0)[:, None], -gn, gn)
        noise = rng.random((len(on), 2)).astype(np.float32)
        wi = np.asarray(sample_cosine_hemisphere(jnp.asarray(noise),
                                                 jnp.asarray(gn)))
        on = (p + 1e-3 * gn)[hitn]
        dn = wi[hitn]
        trih = trin[hitn]
        add(f"bounce{bounce}raw", jnp.asarray(on), jnp.asarray(dn))
        order = np.argsort(trih, kind="stable")
        os_, ds_ = on[order], dn[order]
        hit, t, tri = add(f"bounce{bounce}srt", jnp.asarray(os_),
                          jnp.asarray(ds_))
        on, dn = os_, ds_

    # --- time the production kernel per set ---
    def make_timer(n):
        @jax.jit
        def run(o, d):
            def body(c, _):
                hit, t, tri = pallas_intersect_closest(scene, c[0], c[1], T_MAX)
                return (c[0] + 1e-7 * t[:, None], c[1]), None
            c, _ = jax.lax.scan(body, (o, d), None, length=REPS)
            return c[0]
        return run

    rows, ts, tags = [], [], []
    for tag, (o, d, sv, it, tiles) in sets.items():
        run = make_timer(o.shape[0])
        r = run(o, d); float(fence(r))  # compile + warm
        t0 = time.time()
        r = run(o, d); float(fence(r))
        dt = (time.time() - t0) / REPS
        rows.append([sv, it, tiles])
        ts.append(dt)
        tags.append(tag)
        print(f"{tag:>12}: rays {o.shape[0]:7d} sv {sv:7d} it {it:7d} "
              f"tiles {tiles:5d}  {dt * 1e3:7.2f} ms/pass", flush=True)

    A = np.asarray(rows, np.float64)
    y = np.asarray(ts, np.float64)
    coef, res, *_ = np.linalg.lstsq(A, y, rcond=None)
    a, b, c = coef * 1e6
    print(f"\nfit: per-super-visit {a:6.2f} us, per-inner-iter {b:6.2f} us, "
          f"per-tile {c:6.2f} us")
    pred = A @ coef
    for tag, p, m in zip(tags, pred, y):
        print(f"  {tag:>12}: pred {p*1e3:7.2f} ms  meas {m*1e3:7.2f} ms")


if __name__ == "__main__":
    main()
