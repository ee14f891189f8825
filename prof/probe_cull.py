"""Mosaic micro-probe: where do the pair-cull kernel's 37us/tile go?
Times single-tile kernels (scan-chained reps in one dispatch):
  a) build      — 3008-row slab+pack into the VMEM key table
  b) build+ex   — + 4 chunked min/erase extract passes (the shipped cull)
  c) extract    — 4 extract passes over a pre-filled table
  d) build+min1 — build + ONE chunked min pass (no erases)
  e) build+fold — build folding per-64-row subchunk mins into a (48,TILE)
                  minitab during the build, + top-4 extract from minitab
Usage: python prof/probe_cull.py [REPS=5000]
"""
import sys; sys.path.insert(0, "/root/repo")
import os, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
import numpy as np
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from rayfinder_tpu.ops.pallas_walk import _slab_entry_rows
from rayfinder_tpu.ops.pallas_pairs import (
    _ENTRY_CLAMP, _ENTRY_MASK, _MAX_KEY, _MISS_BASE, _REDCH, _SUBCH)

REPS = int(sys.argv[1]) if len(sys.argv) > 1 else 5000
C, TILE = 3008, 128
NSUB = C // _SUBCH


def run(name, kernel, scratch):
    mins = jnp.asarray(np.random.rand(3, C).astype(np.float32))
    maxs = mins + 0.3
    rays = jnp.asarray(np.random.randn(9, TILE).astype(np.float32))

    def full(shape):
        zeros = tuple(0 for _ in shape)
        return pl.BlockSpec(shape, lambda z=zeros: z, memory_space=pltpu.VMEM)

    f = pl.pallas_call(
        kernel,
        in_specs=[full(mins.shape), full(maxs.shape), full(rays.shape)],
        out_specs=full((8, TILE)),
        out_shape=jax.ShapeDtypeStruct((8, TILE), jnp.int32),
        scratch_shapes=scratch,
    )

    @jax.jit
    def reps(mins, maxs, rays):
        def body(c, _):
            r = f(mins, maxs, rays + c[0, 0:1, :].astype(jnp.float32) * 0)
            return r[None] * 0 + r[None], None
        out, _ = jax.lax.scan(body, jnp.zeros((1, 8, TILE), jnp.int32), None,
                              length=REPS)
        return jnp.sum(out)

    float(reps(mins, maxs, rays))
    t0 = time.time()
    v = float(reps(mins, maxs, rays))
    dt = time.time() - t0
    print(f"{name:>12}: {dt / REPS * 1e6:8.3f} us/rep   (sum {v:.0f})",
          flush=True)


def regs(rays_ref):
    return [rays_ref[i, :] for i in range(9)]


def build(mins_ref, maxs_ref, rays_ref, keytab, fold_ref=None):
    ox, oy, oz, dx, dy, dz, ix, iy, iz = regs(rays_ref)
    tmax = jnp.full((TILE,), 1e4, jnp.float32)
    for a in range(0, C, _SUBCH):
        e = _slab_entry_rows(mins_ref[:, a:a + _SUBCH],
                             maxs_ref[:, a:a + _SUBCH],
                             ox, oy, oz, ix, iy, iz, tmax)
        cid = jax.lax.broadcasted_iota(jnp.int32, (_SUBCH, TILE), 0) + jnp.int32(a)
        finite = e < _ENTRY_CLAMP
        bits = jax.lax.bitcast_convert_type(
            jnp.maximum(e, jnp.float32(0.0)), jnp.int32)
        key = jnp.where(finite, (bits & _ENTRY_MASK) | cid, _MISS_BASE | cid)
        keytab[a:a + _SUBCH, :] = key
        if fold_ref is not None:
            fold_ref[a // _SUBCH, :] = key.min(axis=0)


def extract(keytab, out_ref, k=4):
    for kk in range(k):
        m = jnp.full((TILE,), _MAX_KEY, jnp.int32)
        for a in range(0, C, _REDCH):
            m = jnp.minimum(m, keytab[a:a + _REDCH, :].min(axis=0))
        out_ref[kk, :] = m
        if kk + 1 < k:
            for a in range(0, C, _REDCH):
                blk = keytab[a:a + _REDCH, :]
                keytab[a:a + _REDCH, :] = jnp.where(blk == m[None, :],
                                                    _MAX_KEY, blk)


def k_build(mins_ref, maxs_ref, rays_ref, out_ref, keytab):
    build(mins_ref, maxs_ref, rays_ref, keytab)
    out_ref[:, :] = keytab[0:8, :]


def k_build_ex(mins_ref, maxs_ref, rays_ref, out_ref, keytab):
    build(mins_ref, maxs_ref, rays_ref, keytab)
    extract(keytab, out_ref)


def k_extract(mins_ref, maxs_ref, rays_ref, out_ref, keytab):
    extract(keytab, out_ref)


def k_build_min1(mins_ref, maxs_ref, rays_ref, out_ref, keytab):
    build(mins_ref, maxs_ref, rays_ref, keytab)
    m = jnp.full((TILE,), _MAX_KEY, jnp.int32)
    for a in range(0, C, _REDCH):
        m = jnp.minimum(m, keytab[a:a + _REDCH, :].min(axis=0))
    out_ref[0, :] = m
    out_ref[1:8, :] = keytab[0:7, :]


def k_build_fold(mins_ref, maxs_ref, rays_ref, out_ref, keytab, fold):
    build(mins_ref, maxs_ref, rays_ref, keytab, fold_ref=fold)
    # top-4 over the (NSUB, TILE) minitab only (approximate: per-subchunk
    # mins, candidates at subchunk granularity)
    for kk in range(4):
        m = fold[:, :].min(axis=0)
        out_ref[kk, :] = m
        if kk < 3:
            fold[:, :] = jnp.where(fold[:, :] == m[None, :], _MAX_KEY,
                                   fold[:, :])


kt = [pltpu.VMEM((C, TILE), jnp.int32)]
run("build", k_build, kt)
run("build+ex", k_build_ex, kt)
run("extract", k_extract, kt)
run("build+min1", k_build_min1, kt)
run("build+fold", k_build_fold,
    kt + [pltpu.VMEM((NSUB, TILE), jnp.int32)])


def k_build_exother(mins_ref, maxs_ref, rays_ref, out_ref, keytab, keytab2):
    # p1: build writes keytab, extract reads the OTHER (untouched) table —
    # isolates read-after-write dependence from code size/scheduling.
    build(mins_ref, maxs_ref, rays_ref, keytab)
    extract(keytab2, out_ref)


def k_regtop4(mins_ref, maxs_ref, rays_ref, out_ref, keytab):
    # p2: running-register top-4 during the build; NO key table at all.
    ox, oy, oz, dx, dy, dz, ix, iy, iz = regs(rays_ref)
    tmax = jnp.full((TILE,), 1e4, jnp.float32)
    run4 = [jnp.full((TILE,), _MAX_KEY, jnp.int32) for _ in range(4)]
    for a in range(0, C, _SUBCH):
        e = _slab_entry_rows(mins_ref[:, a:a + _SUBCH],
                             maxs_ref[:, a:a + _SUBCH],
                             ox, oy, oz, ix, iy, iz, tmax)
        cid = jax.lax.broadcasted_iota(jnp.int32, (_SUBCH, TILE), 0) + jnp.int32(a)
        finite = e < _ENTRY_CLAMP
        bits = jax.lax.bitcast_convert_type(
            jnp.maximum(e, jnp.float32(0.0)), jnp.int32)
        key = jnp.where(finite, (bits & _ENTRY_MASK) | cid, _MISS_BASE | cid)
        # top-4 of the subchunk (min + erase within registers), merged into
        # the running 4 by an insertion ladder.
        for _ in range(4):
            m = key.min(axis=0)
            key = jnp.where(key == m[None, :], _MAX_KEY, key)
            for i in range(4):
                lo = jnp.minimum(run4[i], m)
                m = jnp.maximum(run4[i], m)
                run4[i] = lo
    for i in range(4):
        out_ref[i, :] = run4[i]
    out_ref[4:8, :] = jnp.stack(run4, axis=0)


run("build+exother", k_build_exother, kt + [pltpu.VMEM((C, TILE), jnp.int32)])
run("regtop4", k_regtop4, kt)


def k_build_dmacopy(mins_ref, maxs_ref, rays_ref, out_ref, keytab, keytab2,
                    sem):
    # p8: build -> VMEM->VMEM DMA copy -> extract from the copy. The DMA
    # engine's dependency machinery replaces the vector-scheduler hazard
    # that serializes the build loop when its stores are later vector-read.
    build(mins_ref, maxs_ref, rays_ref, keytab)
    dma = pltpu.make_async_copy(keytab, keytab2, sem)
    dma.start()
    dma.wait()
    extract(keytab2, out_ref)


def k_build_alternate(mins_ref, maxs_ref, rays_ref, out_ref, keytab, keytab2):
    # p4: two tiles pipelined across two tables — extract tile 0's table
    # while building tile 1's. Reports cost for TWO tiles.
    build(mins_ref, maxs_ref, rays_ref, keytab)
    build(mins_ref, maxs_ref, rays_ref, keytab2)   # "tile 1" build
    extract(keytab, out_ref)                        # "tile 0" extract
    extract(keytab2, out_ref)                       # "tile 1" extract


run("build+dmacopy", k_build_dmacopy,
    kt + [pltpu.VMEM((C, TILE), jnp.int32), pltpu.SemaphoreType.DMA(())])
run("2x build+alt", k_build_alternate, kt + [pltpu.VMEM((C, TILE), jnp.int32)])


def k_subchunk_top4(mins_ref, maxs_ref, rays_ref, out_ref, keytab):
    # p11: per-64-row-subchunk top-4 + 5th-min residual, written straight
    # to VMEM (never read back in-kernel; no cross-subchunk carries).
    ox, oy, oz, dx, dy, dz, ix, iy, iz = regs(rays_ref)
    tmax = jnp.full((TILE,), 1e4, jnp.float32)
    for a in range(0, C, _SUBCH):
        e = _slab_entry_rows(mins_ref[:, a:a + _SUBCH],
                             maxs_ref[:, a:a + _SUBCH],
                             ox, oy, oz, ix, iy, iz, tmax)
        cid = jax.lax.broadcasted_iota(jnp.int32, (_SUBCH, TILE), 0) + jnp.int32(a)
        finite = e < _ENTRY_CLAMP
        bits = jax.lax.bitcast_convert_type(
            jnp.maximum(e, jnp.float32(0.0)), jnp.int32)
        key = jnp.where(finite, (bits & _ENTRY_MASK) | cid, _MISS_BASE | cid)
        s = a // _SUBCH
        for kk in range(5):
            m = key.min(axis=0)
            keytab[s * 5 + kk, :] = m
            if kk < 4:
                key = jnp.where(key == m[None, :], _MAX_KEY, key)
    out_ref[:, :] = keytab[0:8, :]  # anti-DCE (small read, cheap per k_build)


run("subchunk_top4", k_subchunk_top4,
    [pltpu.VMEM((5 * NSUB, TILE), jnp.int32)])
