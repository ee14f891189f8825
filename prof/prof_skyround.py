"""Split the cost of one full-width regen round (pure-sky rays, Duck tables,
single-super fast path) into sweep vs sky-eval vs primary-regen.

Builds a mini Pallas kernel that loops ROUNDS times over a tile doing a
configurable subset of the real one_round work:
  full  — sweep + sky + regen (the real phase-0 round)
  nosweep — sky + regen only
  sweeponly — sweep only
"""
import sys; sys.path.insert(0, "/root/repo")
import os, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
import numpy as np
import jax, jax.numpy as jnp
from functools import partial
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from rayfinder_tpu.render.scene import load_device_scene
from rayfinder_tpu.render.camera import create_camera
from rayfinder_tpu.sky.model import sky_state_from_ui
from rayfinder_tpu.ops.pallas_walk import (
    _closest_tile_sweep, _walk_tables_and_specs, _interpret)
from rayfinder_tpu.ops import pallas_regen as pr

TILE = int(os.environ.get("PROF_TILE", "1024"))
RT = 8
TILES = 64            # 64K lanes
ROUNDS = int(os.environ.get("PROF_ROUNDS", "64"))

scene = load_device_scene("/root/reference/assets/Duck.glb")
camera = create_camera([2.0, 1.5, 2.0], [0.1, 0.8, 0.0], 0.0, 1.0, 70.0, 800/600)
sky = sky_state_from_ui(1.0, (1.0, 1.0, 1.0), 30.0, 0.0)
fscal = pr._pack_fscal(camera, sky, 1e30, jnp.asarray([1/800., 1/600.], jnp.float32))
iscal = jnp.asarray([0, 256, 1 << 20], jnp.int32)

grouped, tables, start_spec, scratch = _walk_tables_and_specs(scene)
assert not grouped
table, starts, super_min, super_max, cl_planes = tables
num_supers = table.shape[0]
leaf = scene.cluster_tris.shape[1]


def make_kernel(mode, rt_count):
    def kernel(pix_ref, fscal, iscal, start_ref, super_min_ref, super_max_ref,
               cl_planes_ref, table_hbm, acc_out,
               super_entry, cl_entry, tbuf, cache_tag, sem):
        g = pl.program_id(0)

        @pl.when(g == 0)
        def _():
            cache_tag[0] = jnp.int32(-1)

        def per_tile(rt, _):
            u_row = pix_ref[rt, 0, :]
            v_row = pix_ref[rt, 1, :]
            nb0 = pix_ref[rt, 2, :]
            nb1 = pix_ref[rt, 3, :]
            lanes = u_row.shape[0]

            def round_body(i, st):
                sample, ox, oy, oz, dx, dy, dz, a0 = st
                if mode in ("full", "sweeponly"):
                    ix = jnp.float32(1.0) / dx
                    iy = jnp.float32(1.0) / dy
                    iz = jnp.float32(1.0) / dz
                    bound0 = jnp.full((lanes,), jnp.float32(1e30))
                    bt, btri = _closest_tile_sweep(
                        (ox, oy, oz, dx, dy, dz, ix, iy, iz), bound0,
                        start_ref, super_min_ref, super_max_ref, cl_planes_ref,
                        table_hbm, super_entry, cl_entry, tbuf, cache_tag, sem,
                        num_supers=num_supers)
                    a0 = a0 + jnp.where(btri >= 0, bt, jnp.float32(0.0))
                if mode in ("full", "nosweep"):
                    skyr, skyg, skyb = pr._sky_rows(dx, dy, dz, fscal)
                    a0 = a0 + skyr + skyg + skyb
                    sample = sample + 1
                    nx, ny = pr._noise_rows(sample, nb0, nb1, iscal)
                    ox, oy, oz, dx, dy, dz = pr._primary_rows(
                        u_row, v_row, nx, ny, fscal)
                else:
                    sample = sample + 1
                if mode == "noop":
                    a0 = a0 + dx
                return (sample, ox, oy, oz, dx, dy, dz, a0)

            sample = jnp.zeros((lanes,), jnp.int32)
            # Real lane-varying primary rays aimed at the sky band (v_tex
            # near 0 -> rays point up, missing the duck).
            nx0, ny0 = pr._noise_rows(sample, nb0, nb1, iscal)
            ox, oy, oz, dx, dy, dz = pr._primary_rows(
                u_row, v_row, nx0, ny0, fscal)
            a0 = jnp.zeros((lanes,), jnp.float32)
            if mode == "fullwhile":
                # Production-shaped loop: while with a per-round
                # vector->scalar flag (mirrors pallas_regen one_round).
                def wcond(st):
                    return st[-1] > 0

                def wbody(st):
                    sample, ox, oy, oz, dx, dy, dz, a0, _ = st
                    ix = jnp.float32(1.0) / dx
                    iy = jnp.float32(1.0) / dy
                    iz = jnp.float32(1.0) / dz
                    bound0 = jnp.where(sample < ROUNDS, jnp.float32(1e30),
                                       jnp.float32(-jnp.inf))
                    bt, btri = _closest_tile_sweep(
                        (ox, oy, oz, dx, dy, dz, ix, iy, iz), bound0,
                        start_ref, super_min_ref, super_max_ref, cl_planes_ref,
                        table_hbm, super_entry, cl_entry, tbuf, cache_tag, sem,
                        num_supers=num_supers)
                    a0 = a0 + jnp.where(btri >= 0, bt, jnp.float32(0.0))
                    skyr, skyg, skyb = pr._sky_rows(dx, dy, dz, fscal)
                    miss = (sample < ROUNDS) & (btri < 0)
                    a0 = a0 + jnp.where(miss, skyr + skyg + skyb,
                                        jnp.float32(0.0))
                    sample = sample + jnp.where(miss, 1, 0)
                    regen = miss & (sample < ROUNDS)
                    nx, ny = pr._noise_rows(sample, nb0, nb1, iscal)
                    pox, poy, poz, pdx, pdy, pdz = pr._primary_rows(
                        u_row, v_row, nx, ny, fscal)
                    ox = jnp.where(regen, pox, ox)
                    oy = jnp.where(regen, poy, oy)
                    oz = jnp.where(regen, poz, oz)
                    dx = jnp.where(regen, pdx, dx)
                    dy = jnp.where(regen, pdy, dy)
                    dz = jnp.where(regen, pdz, dz)
                    flag = jnp.max(jnp.where(regen, 1, 0)).astype(jnp.int32)
                    return (sample, ox, oy, oz, dx, dy, dz, a0, flag)

                st = jax.lax.while_loop(
                    wcond, wbody,
                    (sample, ox, oy, oz, dx, dy, dz, a0, jnp.int32(1)))
                acc_out[rt, 0, :] = st[7]
                return 0
            st = jax.lax.fori_loop(
                0, ROUNDS, round_body,
                (sample, ox, oy, oz, dx, dy, dz, a0))
            acc_out[rt, 0, :] = st[7]
            return 0

        jax.lax.fori_loop(0, rt_count, per_tile, 0)

    return kernel


def run(mode):
    u = jnp.linspace(0.05, 0.95, TILE, dtype=jnp.float32)
    pix = jnp.zeros((TILES, 4, TILE), jnp.float32)
    pix = pix.at[:, 0, :].set(u[None, :])
    pix = pix.at[:, 1, :].set(float(os.environ.get("PROF_V", "0.05")))
    pix = pix.at[:, 2, :].set(0.25)
    pix = pix.at[:, 3, :].set(0.75)
    out = pl.pallas_call(
        make_kernel(mode, RT),
        grid=(TILES // RT,),
        in_specs=[
            pl.BlockSpec((RT, 4, TILE), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            start_spec,
            pl.BlockSpec(super_min.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(super_max.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(cl_planes.shape, lambda i: (0, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=[pl.BlockSpec((RT, 1, TILE), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)],
        out_shape=[jax.ShapeDtypeStruct((TILES, 1, TILE), jnp.float32)],
        scratch_shapes=scratch(num_supers, TILE),
        interpret=_interpret(),
    )(pix, fscal, iscal, starts, super_min, super_max, cl_planes, table)
    return out[0]


fence = jax.jit(lambda a: jnp.sum(a))
for mode in os.environ.get(
        "PROF_MODES", "full,nosweep,sweeponly,noop").split(","):
    f = jax.jit(partial(run, mode))
    r = f(); float(fence(r))  # warm/compile
    t0 = time.time()
    r = f(); float(fence(r))
    dt = time.time() - t0
    per_sample = dt / (TILES * TILE * ROUNDS) * 1e9
    print(f"{mode:10s}: {dt*1e3:8.2f} ms total  {per_sample:6.2f} ns/lane-round",
          flush=True)
