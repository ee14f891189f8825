"""Phase decomposition of the in-kernel-shaded Duck accumulate: times the
split phase-0 call, the XLA shade, and each shaded-kernel phase separately.

Compare against the split loop's profile (CLAUDE.md): full-width 1 iter
~0.21s @1024 tiles, then 76 iters x 7.05ms @49152, then 118 x 0.76ms @8192.
"""
import os
import pathlib
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
pathlib.Path(os.environ["JAX_COMPILATION_CACHE_DIR"]).mkdir(parents=True, exist_ok=True)

import numpy as np
import jax
import jax.numpy as jnp

import sys
sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))

from rayfinder_tpu.render.camera import create_camera
from rayfinder_tpu.render.rng import blue_noise_tile, _A1, _A2
from rayfinder_tpu.render.scene import load_device_scene
from rayfinder_tpu.render.tiling import block_order
from rayfinder_tpu.render.pathtracer import (
    T_MAX, _FULL_TILE, _nee_and_continuation, _phase_sizes, _COMPACT_FLOOR,
)
from rayfinder_tpu.ops.pallas_regen import (
    pallas_trace_regen, pallas_trace_regen_shaded,
)
from rayfinder_tpu.sky.model import sky_state_from_ui

W, H, SPP, NB = 800, 600, 256, 4
NF = int(os.environ.get("NF", "64"))

scene = load_device_scene("/root/reference/assets/Duck.glb")
camera = create_camera([2.0, 1.5, 2.0], [0.1, 0.8, 0.0], 0.0, 1.0, 70.0, W / H)
sky = sky_state_from_ui(1.0, (1.0, 1.0, 1.0), 30.0, 0.0)
tilebn = jnp.asarray(blue_noise_tile())

ys_np, xs_np, _ = block_order(W, H)
ys = jnp.asarray(ys_np)
xs = jnp.asarray(xs_np)
u = (xs.astype(jnp.float32) + 0.5) / jnp.float32(W)
v_tex = (ys.astype(jnp.float32) + 0.5) / jnp.float32(H)
batch = u.shape[0]
th, tw = tilebn.shape[0], tilebn.shape[1]
nb_full = tilebn[ys % th, xs % tw]
inv_dims = jnp.float32(1.0) / jnp.asarray([W, H], jnp.float32)
nf = jnp.int32(NF)
spp_dyn = jnp.int32(SPP)
nbd = jnp.int32(NB)
sun_dir = jnp.asarray(sky.sun_direction)
solar = jnp.asarray(sky.solar_radiances)
park = jnp.asarray([1e30, 1e30, 1e30], jnp.float32)

fence = jax.jit(lambda *a: sum(jnp.sum(x) for x in a))


def tick(label, t0, *arrs):
    float(fence(*arrs))
    dt = time.time() - t0
    print(f"{label}: {dt*1e3:.1f} ms")
    return time.time()


@jax.jit
def noise_of(nb, s):
    n = ((0 + s) % spp_dyn).astype(jnp.float32)
    r2 = jnp.stack([_A1 * n, _A2 * n], axis=-1)
    r2 = r2 - jnp.floor(r2)
    out = nb + r2
    return out - jnp.floor(out)


@jax.jit
def primary(noise):
    from rayfinder_tpu.render.camera import generate_camera_ray_lens
    jitter = noise * inv_dims
    ray_u = u + jitter[:, 0]
    ray_v = (jnp.float32(1.0) - v_tex) + jitter[:, 1]
    return generate_camera_ray_lens(camera, noise, ray_u, ray_v)


@jax.jit
def shade(sample, origin, direction, tri, thr, bounce):
    live = sample < nf
    noise = noise_of(nb_full, sample)
    return _nee_and_continuation(
        scene, noise, origin, direction, tri, thr, bounce, live,
        sun_dir, solar, park, NB)


def run(repeat=2):
    sizes = _phase_sizes(batch, _COMPACT_FLOOR)
    print("phase sizes:", sizes)
    ft = _FULL_TILE
    full_tiles = (ft, 4096 // ft)
    for it in range(repeat):
        print(f"--- iteration {it} ---")
        sample = jnp.zeros((batch,), jnp.int32)
        noise0 = noise_of(nb_full, sample)
        o0, d0 = primary(noise0)
        z3 = jnp.zeros((batch, 3), jnp.float32)
        state = (sample, jnp.ones((batch,), jnp.int32),
                 jnp.zeros((batch,), jnp.int32), o0, d0,
                 jnp.ones((batch, 3), jnp.float32), z3, z3,
                 jnp.broadcast_to(park, (batch, 3)),
                 jnp.broadcast_to(jnp.asarray([1.0, 0.0, 0.0], jnp.float32), (batch, 3)),
                 z3)
        t0 = time.time()
        (sample, bounce, origin, direction, thr, srad, lrad, _t, tri
         ) = pallas_trace_regen(
            scene, camera, sky, u, v_tex, nb_full, inv_dims, jnp.int32(0),
            spp_dyn, nf, T_MAX, *state[:7], state[7], state[8], state[9],
            state[10], tile_override=full_tiles)
        t0 = tick("phase0 split kernel", t0, sample, lrad, tri)
        live = jnp.sum((sample < nf).astype(jnp.int32))
        print("  live after phase0:", int(live))
        (flag, origin, direction, thr, bounce, sh_o, sh_d, contrib
         ) = shade(sample, origin, direction, tri, thr, bounce)
        t0 = tick("phase0 XLA shade", t0, flag, origin, contrib)

        # compact to sizes[1]
        size = sizes[1]
        busy = sample < nf
        idx = jnp.nonzero(busy, size=size, fill_value=0)[0].astype(jnp.int32)
        valid = jnp.arange(size, dtype=jnp.int32) < jnp.sum(busy.astype(jnp.int32))
        take = lambda a: a[idx]
        st = (jnp.where(valid, take(sample), nf), take(bounce), take(flag),
              take(origin), take(direction), take(thr), take(srad),
              jnp.zeros((size, 3), jnp.float32),
              take(sh_o), take(sh_d), take(contrib))
        cu, cv, cnb = take(u), take(v_tex), take(nb_full)
        t0 = tick("compact", t0, st[0], st[3])

        cur = size
        for nxt in sizes[2:]:
            floor = max(0, nxt // max(1, cur // 128))
            st = pallas_trace_regen_shaded(
                scene, camera, sky, cu, cv, cnb, inv_dims, jnp.int32(0),
                spp_dyn, nf, nbd, jnp.int32(floor), T_MAX, *st)
            t0 = tick(f"shaded@{cur} floor={floor}", t0, st[0], st[7])
            print("  live:", int(jnp.sum((st[0] < nf).astype(jnp.int32))))
            busy = st[0] < nf
            idx = jnp.nonzero(busy, size=nxt, fill_value=0)[0].astype(jnp.int32)
            valid = jnp.arange(nxt, dtype=jnp.int32) < jnp.sum(busy.astype(jnp.int32))
            take = lambda a: a[idx]
            cu, cv, cnb = take(cu), take(cv), take(cnb)
            st = (jnp.where(valid, take(st[0]), nf), take(st[1]), take(st[2]),
                  take(st[3]), take(st[4]), take(st[5]), take(st[6]),
                  jnp.zeros((nxt, 3), jnp.float32),
                  take(st[8]), take(st[9]), take(st[10]))
            cur = nxt
        st = pallas_trace_regen_shaded(
            scene, camera, sky, cu, cv, cnb, inv_dims, jnp.int32(0),
            spp_dyn, nf, nbd, jnp.int32(0), T_MAX, *st)
        t0 = tick(f"shaded@{cur} floor=0", t0, st[0], st[7])


if __name__ == "__main__" and not os.environ.get("SPLIT_ARM"):
    run()


def run_split_arm():
    """From the same phase-0 state, run the SPLIT loop (kernel + XLA shade
    per iteration) at 49152 and 8192 widths for comparison."""
    sizes = _phase_sizes(batch, _COMPACT_FLOOR)
    ft = _FULL_TILE
    full_tiles = (ft, 4096 // ft)
    for it in range(2):
        print(f"--- split arm iteration {it} ---")
        sample = jnp.zeros((batch,), jnp.int32)
        noise0 = noise_of(nb_full, sample)
        o0, d0 = primary(noise0)
        z3 = jnp.zeros((batch, 3), jnp.float32)
        state = (sample, jnp.ones((batch,), jnp.int32),
                 jnp.zeros((batch,), jnp.int32), o0, d0,
                 jnp.ones((batch, 3), jnp.float32), z3, z3,
                 jnp.broadcast_to(park, (batch, 3)),
                 jnp.broadcast_to(jnp.asarray([1.0, 0.0, 0.0], jnp.float32), (batch, 3)),
                 z3)
        (sample, bounce, origin, direction, thr, srad, lrad, _t, tri
         ) = pallas_trace_regen(
            scene, camera, sky, u, v_tex, nb_full, inv_dims, jnp.int32(0),
            spp_dyn, nf, T_MAX, *state[:7], state[7], state[8], state[9],
            state[10], tile_override=full_tiles)
        (flag, origin, direction, thr, bounce, sh_o, sh_d, contrib
         ) = shade(sample, origin, direction, tri, thr, bounce)
        float(fence(flag, origin))

        size = sizes[1]
        busy = sample < nf
        idx = jnp.nonzero(busy, size=size, fill_value=0)[0].astype(jnp.int32)
        valid = jnp.arange(size, dtype=jnp.int32) < jnp.sum(busy.astype(jnp.int32))
        take = lambda a: a[idx]
        cu, cv, cnb = take(u), take(v_tex), take(nb_full)
        st = (jnp.where(valid, take(sample), nf), take(bounce), take(flag),
              take(origin), take(direction), take(thr), take(srad),
              jnp.zeros((size, 3), jnp.float32),
              take(sh_o), take(sh_d), take(contrib))
        float(fence(st[0], st[3]))

        @jax.jit
        def shade_c(cnb, sample, origin, direction, tri, thr, bounce):
            live = sample < nf
            noise = noise_of(cnb, sample)
            return _nee_and_continuation(
                scene, noise, origin, direction, tri, thr, bounce,
                live, sun_dir, solar, park, NB)

        cur = size
        for tgt in sizes[2:] + [0]:
            iters = 0
            t0 = time.time()
            while int(jnp.sum((st[0] < nf).astype(jnp.int32))) > tgt:
                (sample, bounce, origin, direction, thr, srad, lrad2, _t, tri
                 ) = pallas_trace_regen(
                    scene, camera, sky, cu, cv, cnb, inv_dims, jnp.int32(0),
                    spp_dyn, nf, T_MAX, *st[:7], st[7], st[8], st[9], st[10])
                (flag, origin, direction, thr, bounce, sh_o, sh_d, contrib
                 ) = shade_c(cnb, sample, origin, direction, tri, thr, bounce)
                st = (sample, bounce, flag, origin, direction, thr, srad,
                      lrad2, sh_o, sh_d, contrib)
                iters += 1
            float(fence(st[0], st[7]))
            dt = time.time() - t0
            print(f"split@{cur} to {tgt}: {dt*1e3:.1f} ms, {iters} iters")
            if tgt:
                busy = st[0] < nf
                idx = jnp.nonzero(busy, size=tgt, fill_value=0)[0].astype(jnp.int32)
                valid = jnp.arange(tgt, dtype=jnp.int32) < jnp.sum(busy.astype(jnp.int32))
                take = lambda a: a[idx]
                cu, cv, cnb = take(cu), take(cv), take(cnb)
                st = (jnp.where(valid, take(st[0]), nf), take(st[1]), take(st[2]),
                      take(st[3]), take(st[4]), take(st[5]), take(st[6]),
                      jnp.zeros((tgt, 3), jnp.float32),
                      take(st[8]), take(st[9]), take(st[10]))
            cur = tgt


if __name__ == "__main__" and os.environ.get("SPLIT_ARM"):
    run_split_arm()
