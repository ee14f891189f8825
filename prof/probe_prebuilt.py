"""Mosaic micro-probe for the prebuilt-entry-table costs (courtyard shapes).

Times, via scan-chained reps inside ONE dispatch (CLAUDE.md: standalone
timeit over-reports small ops through the tunnel):
  a) one (S*G, TILE) slab-entry build (the per-sweep prebuild),
  b) S separate (G, TILE) slab-entry builds (the old per-visit build, x S),
  c) a dynamic-offset sublane slice copy (G, TILE) out of (S*G, TILE),
  d) a static slice copy for reference,
  e) per-super aggregation: S static (G, TILE) min-reduces.

Usage: python prof/probe_prebuilt.py [S=24] [REPS=2000]
"""
import sys; sys.path.insert(0, "/root/repo")
import os, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
import numpy as np
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from rayfinder_tpu.ops.pallas_walk import _slab_entry_rows

S = int(sys.argv[1]) if len(sys.argv) > 1 else 24
REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 2000
G, TILE = 128, 128


def run(name, kernel, scratch, n_out=1):
    mins = jnp.asarray(np.random.rand(3, S * G).astype(np.float32))
    maxs = mins + 1.0
    rays = jnp.asarray(np.random.randn(9, TILE).astype(np.float32))

    def full(shape):
        zeros = tuple(0 for _ in shape)
        return pl.BlockSpec(shape, lambda z=zeros: z, memory_space=pltpu.VMEM)

    f = pl.pallas_call(
        kernel,
        in_specs=[full(mins.shape), full(maxs.shape), full(rays.shape)],
        out_specs=full((8, TILE)),
        out_shape=jax.ShapeDtypeStruct((8, TILE), jnp.float32),
        scratch_shapes=scratch,
    )

    @jax.jit
    def reps(mins, maxs, rays):
        def body(c, _):
            r = f(mins, maxs, rays + c[0, 0:1, :] * 0)
            return r[None] * 0 + r[None], None
        out, _ = jax.lax.scan(body, jnp.zeros((1, 8, TILE)), None, length=REPS)
        return jnp.sum(out)

    float(reps(mins, maxs, rays))  # compile+warm
    t0 = time.time()
    v = float(reps(mins, maxs, rays))
    dt = time.time() - t0
    print(f"{name:>28}: {dt / REPS * 1e6:8.3f} us/rep   (sum {v:.1f})")


def regs(rays_ref):
    r = [rays_ref[i, :] for i in range(9)]
    return r


def k_build_one(mins_ref, maxs_ref, rays_ref, out_ref, cl_all):
    ox, oy, oz, dx, dy, dz, ix, iy, iz = regs(rays_ref)
    bound = jnp.full((TILE,), 1e4, jnp.float32)
    e = _slab_entry_rows(mins_ref[:, :], maxs_ref[:, :],
                         ox, oy, oz, ix, iy, iz, bound)
    cl_all[:, :] = e
    out_ref[:, :] = cl_all[0:8, :]


def k_build_split(mins_ref, maxs_ref, rays_ref, out_ref, cl_all):
    ox, oy, oz, dx, dy, dz, ix, iy, iz = regs(rays_ref)
    bound = jnp.full((TILE,), 1e4, jnp.float32)
    for s in range(S):
        e = _slab_entry_rows(mins_ref[:, s * G:(s + 1) * G],
                             maxs_ref[:, s * G:(s + 1) * G],
                             ox, oy, oz, ix, iy, iz, bound)
        cl_all[s * G:(s + 1) * G, :] = e
    out_ref[:, :] = cl_all[0:8, :]


def k_build_agg(mins_ref, maxs_ref, rays_ref, out_ref, cl_all, agg):
    ox, oy, oz, dx, dy, dz, ix, iy, iz = regs(rays_ref)
    bound = jnp.full((TILE,), 1e4, jnp.float32)
    for s in range(S):
        e = _slab_entry_rows(mins_ref[:, s * G:(s + 1) * G],
                             maxs_ref[:, s * G:(s + 1) * G],
                             ox, oy, oz, ix, iy, iz, bound)
        cl_all[s * G:(s + 1) * G, :] = e
        agg[s, :] = jnp.min(e, axis=0)
    out_ref[:, :] = cl_all[0:8, :] + jnp.sum(agg[:, :], axis=0)[None, :]


def k_dyn_slice(mins_ref, maxs_ref, rays_ref, out_ref, cl_all, cl_entry):
    # dynamic offset derived from data (prevents constant folding)
    s = jnp.minimum(jnp.float32(S - 1),
                    jnp.abs(mins_ref[0, 0])).astype(jnp.int32)
    off = pl.multiple_of(s * G, G)
    cl_entry[:, :] = cl_all[pl.ds(off, G), :]
    out_ref[:, :] = cl_entry[0:8, :]


def k_static_slice(mins_ref, maxs_ref, rays_ref, out_ref, cl_all, cl_entry):
    cl_entry[:, :] = cl_all[G:2 * G, :]
    out_ref[:, :] = cl_entry[0:8, :]


def k_agg_only(mins_ref, maxs_ref, rays_ref, out_ref, cl_all, agg):
    for s in range(S):
        agg[s, :] = jnp.min(cl_all[s * G:(s + 1) * G, :], axis=0)
    # depend on EVERY agg row (the first probe version read only 8 and let
    # Mosaic DCE 16 of the reduces)
    out_ref[:, :] = jnp.min(agg[:, :], axis=0)[None, :] + jnp.zeros((8, TILE))


def k_split_then_agg(mins_ref, maxs_ref, rays_ref, out_ref, cl_all, agg):
    """Per-super build loop, THEN aggregate reading back from VMEM in a
    second loop (breaks the long register live ranges the fused version
    suffered; the one-pass build + agg variant OOM'd scoped VMEM: Mosaic
    stacks ~20 live (S*G, TILE) temporaries)."""
    ox, oy, oz, dx, dy, dz, ix, iy, iz = regs(rays_ref)
    bound = jnp.full((TILE,), 1e4, jnp.float32)
    for s in range(S):
        e = _slab_entry_rows(mins_ref[:, s * G:(s + 1) * G],
                             maxs_ref[:, s * G:(s + 1) * G],
                             ox, oy, oz, ix, iy, iz, bound)
        cl_all[s * G:(s + 1) * G, :] = e
    for s in range(S):
        agg[s, :] = jnp.min(cl_all[s * G:(s + 1) * G, :], axis=0)
    out_ref[:, :] = (cl_all[0:8, :]
                     + jnp.min(agg[:, :], axis=0)[None, :])


def k_global_select(mins_ref, maxs_ref, rays_ref, out_ref, cl_all):
    """One global front-to-back selection over the full (S*G, TILE) table
    (masked min + row argmin) — the per-super-iteration cost of skipping
    the aggregated table entirely."""
    bt = jnp.abs(rays_ref[0, :]) + jnp.float32(1.0)
    masked = jnp.where(cl_all[:, :] < bt[None, :], cl_all[:, :], jnp.inf)
    key = jnp.min(masked, axis=1, keepdims=True)
    j = jnp.argmin(key, axis=0)[0].astype(jnp.int32)
    out_ref[:, :] = (jnp.full((8, TILE), jnp.min(key))
                     + j.astype(jnp.float32))


def k_agg_select(mins_ref, maxs_ref, rays_ref, out_ref, agg):
    """Selection over the aggregated (S, TILE) table (per super-iteration
    cost of the agg design)."""
    bt = jnp.abs(rays_ref[0, :]) + jnp.float32(1.0)
    masked = jnp.where(agg[:, :] < bt[None, :], agg[:, :], jnp.inf)
    key = jnp.min(masked, axis=1, keepdims=True)
    j = jnp.argmin(key, axis=0)[0].astype(jnp.int32)
    out_ref[:, :] = (jnp.full((8, TILE), jnp.min(key))
                     + j.astype(jnp.float32))


cl_all = pltpu.VMEM((S * G, TILE), jnp.float32)
cl_entry = pltpu.VMEM((G, TILE), jnp.float32)
agg = pltpu.VMEM((S, TILE), jnp.float32)

run("split build then agg", k_split_then_agg, [cl_all, agg])
run(f"agg only {S} min-reduces", k_agg_only, [cl_all, agg])
run("global select (S*G rows)", k_global_select, [cl_all])
run("agg select (S rows)", k_agg_select, [agg])
run("static slice copy", k_static_slice, [cl_all, cl_entry])


def k_fori_guarded(mins_ref, maxs_ref, rays_ref, out_ref, cl_all, agg):
    """The round-5 production _prebuild_entries form: fat seed into agg,
    then a fori_loop with a per-super pl.when(finite) guard around the
    build + fused agg (dynamic-index loads/stores)."""
    ox, oy, oz, dx, dy, dz, ix, iy, iz = regs(rays_ref)
    bound = jnp.full((TILE,), 1e4, jnp.float32)
    # data-dependent, ~always-finite seed (stands in for the fat fold);
    # NOTE a (1,1)->(S,TILE) broadcast is unsupported in Mosaic ("Broadcast
    # in both sublanes and lanes") — broadcast a full lane row instead.
    agg[:, :] = jnp.zeros((S, TILE)) + jnp.abs(mins_ref[0, 0:TILE])[None, :] * 0

    def body(s, _):
        @pl.when(jnp.isfinite(jnp.min(agg[s, :])))
        def _():
            e = _slab_entry_rows(
                mins_ref[:, pl.ds(pl.multiple_of(s * G, G), G)],
                maxs_ref[:, pl.ds(pl.multiple_of(s * G, G), G)],
                ox, oy, oz, ix, iy, iz, bound)
            off = pl.multiple_of(s * G, G)
            cl_all[pl.ds(off, G), :] = e
            agg[s, :] = jnp.min(e, axis=0)

        return 0

    jax.lax.fori_loop(0, S, body, 0)
    out_ref[:, :] = (cl_all[0:8, :]
                     + jnp.min(agg[:, :], axis=0)[None, :])


def k_fori_plain(mins_ref, maxs_ref, rays_ref, out_ref, cl_all, agg):
    """fori build+agg with no guard."""
    ox, oy, oz, dx, dy, dz, ix, iy, iz = regs(rays_ref)
    bound = jnp.full((TILE,), 1e4, jnp.float32)

    def body(s, _):
        e = _slab_entry_rows(
            mins_ref[:, pl.ds(pl.multiple_of(s * G, G), G)],
            maxs_ref[:, pl.ds(pl.multiple_of(s * G, G), G)],
            ox, oy, oz, ix, iy, iz, bound)
        off = pl.multiple_of(s * G, G)
        cl_all[pl.ds(off, G), :] = e
        agg[s, :] = jnp.min(e, axis=0)
        return 0

    jax.lax.fori_loop(0, S, body, 0)
    out_ref[:, :] = (cl_all[0:8, :]
                     + jnp.min(agg[:, :], axis=0)[None, :])


def make_chunk(C):
    def k_chunk(mins_ref, maxs_ref, rays_ref, out_ref, cl_all, agg3):
        """fori over S//C chunks, static C-super unroll inside: restores
        intra-chunk pipelining while bounding liveness to C blocks. The
        per-super minima ride a (S//C, C, TILE) layout so each chunk's
        aggregate stores with a traced LEADING index (sublane-dim dynamic
        stores have (8,128) alignment hazards)."""
        ox, oy, oz, dx, dy, dz, ix, iy, iz = regs(rays_ref)
        bound = jnp.full((TILE,), 1e4, jnp.float32)

        def body(c, _):
            base = pl.multiple_of(c * (C * G), C * G)
            mins = []
            for k in range(C):
                off = base + k * G
                e = _slab_entry_rows(
                    mins_ref[:, pl.ds(off, G)],
                    maxs_ref[:, pl.ds(off, G)],
                    ox, oy, oz, ix, iy, iz, bound)
                cl_all[pl.ds(off, G), :] = e
                mins.append(jnp.min(e, axis=0))
            agg3[c, :, :] = jnp.stack(mins, axis=0)
            return 0

        jax.lax.fori_loop(0, S // C, body, 0)
        out_ref[:, :] = (cl_all[0:8, :]
                         + jnp.min(jnp.min(agg3[:, :, :], axis=0),
                                   axis=0)[None, :])

    return k_chunk


run("fori guarded (production)", k_fori_guarded, [cl_all, agg])
run("fori plain", k_fori_plain, [cl_all, agg])
for C in (4, 8, 12):
    if S % C == 0:
        agg3 = pltpu.VMEM((S // C, C, TILE), jnp.float32)
        run(f"chunked fori C={C}", make_chunk(C), [cl_all, agg3])
