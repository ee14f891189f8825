"""Persistent path kernel: traversal + sky + path regeneration in one Pallas
kernel.

Motivation (measured, Duck 800x600 64spp/4bounce): ~90% of all path segments
are primary rays that MISS the geometry — their whole lifecycle is
"generate camera ray -> reject against the scene bounds -> evaluate sky ->
start the next sample". Running each such segment as a full wavefront
iteration costs a closest-hit dispatch plus an XLA shading pass over every
lane (~14ms x 64 iterations). This kernel keeps those segments entirely
on-chip: each ray tile loops internally — trace; on miss, accumulate
throughput x sky radiance, finish the sample, and regenerate the pixel's
next primary ray in-register; on hit, STOP the lane and return the hit to
the XLA wavefront (texturing/NEE need HBM gathers the kernel cannot do).
One kernel dispatch therefore consumes every consecutive missing sample of
every lane, and the outer loop only runs once per HIT segment.

A second kernel variant (_make_shaded_path_kernel / pallas_trace_regen_shaded)
keeps hit segments on-chip too: surface interaction, texture albedo, NEE
light sampling and the cosine-weighted scatter all run in-kernel via exact
dynamic_gather / bf16-matmul gathers. It benches slightly behind the split
loop on the Duck bench (see render/pathtracer._inkernel_enabled for the
measured story), so it is opt-in (RAYFINDER_INKERNEL=1).

Numerics: the sky evaluation matches sky/model.sky_radiance_dist
(reference src/hw-skymodel/hw_skymodel.c:182-223, wgsl:247-275) except that
Mosaic has no acos lowering, so gamma/theta use an Abramowitz-Stegun 4.4.45
polynomial (|err| <= 2e-8 rad) instead of XLA's acos — far inside the
renderer's 1e-3 RMSE contract, asserted by tests/test_pallas_regen.py.
Camera rays match render/camera.generate_camera_ray_lens and the noise
stream matches render/rng.animated_blue_noise bit-for-bit (mul/floor only).
"""

from __future__ import annotations

import os
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_walk import (
    _any_tile_sweep,
    _any_tile_sweep_grouped,
    _any_tile_sweep_prebuilt,
    _closest_tile_sweep,
    _closest_tile_sweep_grouped,
    _closest_tile_sweep_prebuilt,
    _interpret,
    _pair_tile_sweep,
    _pick_tile,
    _walk_tables_and_specs,
)

# Fuse the NEE-prologue occlusion sweep and the first closest sweep into one
# pair sweep (single-super flat scenes): both traversals share one selection
# loop and one scalar sync per iteration. MEASURED LOSS on TPU (Duck bench
# 42.0 vs 49.2 Mrays/s, 2026-08-17): the per-iteration selection passes over
# the stacked (2R, TILE) entry table cost more than the saved syncs — the
# table passes, not the scalar syncs, are the binding per-iteration cost.
# Kept opt-in for bigger-leaf or fatter-tile configs where the balance may
# differ.
_PAIR = os.environ.get("RAYFINDER_PAIR", "0") == "1"

_TWO_PI = np.float32(2.0 * np.pi)
_PI = np.float32(np.pi)
# R2 sequence constants (render/rng.py, wgsl:609-610).
_A1 = np.float32(0.7548776662466927)
_A2 = np.float32(0.5698402909980532)
# Abramowitz & Stegun 4.4.45 acos fit on [0, 1], |eps| <= 2e-8 rad.
# Trace/regen rounds per while iteration in the path kernel's main loop
# (results are identical for any value >= 1). A/B on TPU (2026-08-17):
# 1 and 2 bench IDENTICAL (31.70 Mrays/s both) — the sync amortization the
# unroll was meant to buy doesn't show at bench shapes, so default 1 for
# the smaller Mosaic program (halves path-kernel compile time).
_ROUND_UNROLL = int(os.environ.get("RAYFINDER_REGEN_UNROLL", "1"))
# Stale (pipelined) main-loop condition: the continue flag becomes "any lane
# inflight at round START" — computed from the round's INPUT state, so the
# vector->scalar reduce resolves during the sweep instead of serializing
# after it (the fresh flag depends on the sweep's miss results). Costs one
# extra fully-guarded round per tile per dispatch. MEASURED LOSS on TPU
# (2026-08-19, driver bench, two runs): Duck 47.5/49.6 vs 52.1, courtyard
# 3.426/3.425 vs 3.455-3.480 — the extra guarded round (entry build +
# selection per tile, on EVERY dispatch of the compacted phases) costs more
# than the hidden reduce->scalar stall. Kept opt-in for wider-tile configs.
_STALE_COND = os.environ.get("RAYFINDER_STALE_COND", "0") == "1"
_ACOS_C = [np.float32(c) for c in (
    1.5707963050, -0.2145988016, 0.0889789874, -0.0501743046,
    0.0308918810, -0.0170881256, 0.0066700901, -0.0012624911,
)]

# fscal scalar-table layout (all float32)
_F_CAM_ORIGIN = 0      # 3
_F_LOWER_LEFT = 3      # 3
_F_HORIZONTAL = 6      # 3
_F_VERTICAL = 9        # 3
_F_RIGHT = 12          # 3
_F_UP = 15             # 3
_F_LENS_RADIUS = 18
_F_T_MAX = 19
_F_SUN = 20            # 3
_F_SKY_RAD = 23        # 3
_F_PARAMS = 26         # 3 channels x 9
_F_INV_W = 53
_F_INV_H = 54
# In-kernel shading extras (pallas_trace_regen ignores them): the sun-frame
# ONB (pixar_onb(sun_direction), matching render/sampling exactly), solar
# radiances, and the solar-disk cone constants.
_F_SUN_U = 55          # 3
_F_SUN_V = 58          # 3
_F_SOLAR = 61          # 3
_F_COS_THETA_MAX = 64
_F_INV_PDF = 65
_F_LEN = 66
# iscal layout (int32): frame_base, spp, num_frames [, num_bounces (shaded)]
_I_LEN = 3
_FRAC_1_PI = np.float32(1.0 / np.pi)


def acos_poly(x):
    """acos on [-1, 1] via A&S 4.4.45 (Mosaic has no acos/atan2 lowering)."""
    ax = jnp.abs(x)
    p = _ACOS_C[7]
    for c in _ACOS_C[6::-1]:
        p = p * ax + c
    r = jnp.sqrt(jnp.maximum(jnp.float32(1.0) - ax, jnp.float32(0.0))) * p
    return jnp.where(x < 0.0, _PI - r, r)


def _sky_rows(dx, dy, dz, f):
    """Perez sky radiance per lane (rows), one output per RGB channel.
    Mirrors sky/model.sky_radiance_dist with cos(theta) taken directly from
    the direction's y component (cos(acos(y)) == y up to ulps)."""
    cos_g = jnp.clip(dx * f[_F_SUN] + dy * f[_F_SUN + 1] + dz * f[_F_SUN + 2],
                     -1.0, 1.0)
    gamma = acos_poly(cos_g)
    cos_t = jnp.abs(jnp.clip(dy, -1.0, 1.0))
    zenith = jnp.sqrt(cos_t)
    cg2 = cos_g * cos_g
    out = []
    for ch in range(3):
        p = [f[_F_PARAMS + 9 * ch + k] for k in range(9)]
        exp_m = jnp.exp(p[4] * gamma)
        mie = (jnp.float32(1.0) + cg2) / jnp.power(
            jnp.float32(1.0) + p[8] * p[8] - jnp.float32(2.0) * p[8] * cos_g,
            jnp.float32(1.5),
        )
        lhs = jnp.float32(1.0) + p[0] * jnp.exp(p[1] / (cos_t + jnp.float32(0.01)))
        rhs = p[2] + p[3] * exp_m + p[5] * cg2 + p[6] * mie + p[7] * zenith
        out.append(f[_F_SKY_RAD + ch] * lhs * rhs)
    return out


def _primary_rows(u, v_tex, nx, ny, f):
    """Thin-lens camera ray (generate_camera_ray_lens) from the lane's pixel
    center (u, v_tex) and the sample's 2D noise: blue-noise sub-pixel jitter,
    v flip (ray v = 1 - texCoord.y, wgsl:52-54), blue-noise lens sample.
    Returns (ox, oy, oz, dx, dy, dz)."""
    ray_u = u + nx * f[_F_INV_W]
    ray_v = (jnp.float32(1.0) - v_tex) + ny * f[_F_INV_H]
    r = jnp.sqrt(nx)
    phi = _TWO_PI * ny
    lpx = f[_F_LENS_RADIUS] * r * jnp.cos(phi)
    lpy = f[_F_LENS_RADIUS] * r * jnp.sin(phi)
    o = [f[_F_CAM_ORIGIN + a] + lpx * f[_F_RIGHT + a] + lpy * f[_F_UP + a]
         for a in range(3)]
    d = [f[_F_LOWER_LEFT + a] + ray_u * f[_F_HORIZONTAL + a]
         + ray_v * f[_F_VERTICAL + a] - o[a] for a in range(3)]
    norm = jnp.sqrt(d[0] * d[0] + d[1] * d[1] + d[2] * d[2])
    d = [di / norm for di in d]
    return o[0], o[1], o[2], d[0], d[1], d[2]


def _noise_rows(sample, nb0, nb1, i):
    """Per-lane animated blue noise for the lane's CURRENT sample index:
    tile base + R2 offset, wrapped (render/rng.animated_blue_noise)."""
    n = jax.lax.rem(i[0] + sample, i[1]).astype(jnp.float32)
    rx = _A1 * n
    rx = rx - jnp.floor(rx)
    ry = _A2 * n
    ry = ry - jnp.floor(ry)
    nx = nb0 + rx
    nx = nx - jnp.floor(nx)
    ny = nb1 + ry
    ny = ny - jnp.floor(ny)
    return nx, ny


def _make_path_kernel(leaf: int, num_supers: int, rt_count: int,
                      grouped: bool = False, pair: bool = False,
                      prebuilt: bool = False, budget: int = 0):
    """budget > 0 (RAYFINDER_SWEEP_BUDGET, grouped kr==1 scenes with
    2..30 supers): each closest sweep is capped at `budget` super visits.
    Lanes with remaining enterable supers return unres=1 with a
    (t, tri, done-super-bitmask) carry instead of a shaded hit; the XLA
    loop re-sorts them (their own key band) and resumes them next
    dispatch via flag==3 — so a divergent tile's straggler lanes stop
    serializing their tile-mates and re-group into coherent
    full-occupancy tiles. Exact: the bitmask makes super progress
    monotone, the carried bound/candidate are valid partial results."""
    from .pallas_walk import _krays

    kr = _krays(grouped, rt_count)
    assert budget == 0 or (grouped and kr == 1 and not pair and not prebuilt)

    def kernel(
        counters_ref, ray_ref, shade_ref, pix_ref, nee_ref,
        fscal, iscal, start_ref, super_min_ref, super_max_ref,
        cl_planes_ref, table_hbm,
        counters_out, ray_out, shade_out, t_out, tri_out,
        *scratch,
    ):
        super_entries = list(scratch[0:kr])
        cl_entries = list(scratch[kr:2 * kr])
        tbuf, cache_tag, sem = scratch[2 * kr:2 * kr + 3]
        super_entry, cl_entry = super_entries[0], cl_entries[0]
        # kr > 1 appends the monotone-act ACTIVE entry table; pair (kr == 1,
        # never grouped) appends its stacked entry table at the same slot;
        # the prebuilt grouped path (kr == 1) appends its all-clusters
        # entry table there. Mutually exclusive by construction.
        cur_entry = scratch[2 * kr + 3] if kr > 1 else None
        pair_entry = scratch[2 * kr + 3] if pair else None
        cl_all = scratch[2 * kr + 3] if prebuilt else None
        g = pl.program_id(0)

        @pl.when(g == 0)
        def _():
            cache_tag[0] = jnp.int32(-1)

        nf = iscal[2]
        t_max = fscal[_F_T_MAX]
        neg_inf = jnp.float32(-jnp.inf)

        # The per-tile body contains the NEE occlusion sweep plus the
        # 3-level trace/regen loop; statically unrolling it rt_count times
        # made the Mosaic program big enough to take ~20min to compile.
        # A fori_loop with a dynamic leading-dim tile index compiles the
        # body ONCE (dynamic indexing is legal on the leading dim only).
        # K-aggregation (kr > 1, grouped big scenes): each fori step owns
        # kr consecutive tile rows whose lanes share the traversal sweeps
        # (see pallas_walk.KRAYS); all per-row bookkeeping unrolls over k.
        # budget > 0 appends 5 carry slots: res_bound, res_tri, res_done
        # (consumed by the FIRST round's sweep, then reset) and the
        # unres/done output accumulators. The continue-flag stays at 20.
        _L = 26 if budget > 0 else 21
        _FLAG = 20

        def load_row(rt):
            """One tile row's lane state + derived NEE shadow quantities.

            flag: 0 = fresh ray (no pending NEE); 1 = pending NEE, input
            ray is the scatter continuation; 2 = pending NEE, the path
            terminates after it (depth limit / degenerate scatter)."""
            r = {"rt": rt}
            r["sample"] = counters_ref[rt, 0, :]
            r["bounce"] = counters_ref[rt, 1, :]
            r["flag"] = counters_ref[rt, 2, :]
            r["o"] = (ray_ref[rt, 0, :], ray_ref[rt, 1, :], ray_ref[rt, 2, :])
            r["d"] = (ray_ref[rt, 3, :], ray_ref[rt, 4, :], ray_ref[rt, 5, :])
            r["t"] = (shade_ref[rt, 0, :], shade_ref[rt, 1, :], shade_ref[rt, 2, :])
            r["s"] = (shade_ref[rt, 3, :], shade_ref[rt, 4, :], shade_ref[rt, 5, :])
            r["l"] = (shade_ref[rt, 6, :], shade_ref[rt, 7, :], shade_ref[rt, 8, :])
            r["u"], r["v"] = pix_ref[rt, 0, :], pix_ref[rt, 1, :]
            r["nb0"], r["nb1"] = pix_ref[rt, 2, :], pix_ref[rt, 3, :]
            r["live"] = r["sample"] < nf
            if budget > 0:
                # flag == 3: resume a budget-interrupted traversal with
                # this carry (no pending NEE).
                r["done"] = counters_ref[rt, 3, :]
                r["tric"] = counters_ref[rt, 4, :]
                r["tcar"] = pix_ref[rt, 4, :]
            # NEE shadow state: the PREVIOUS segment's light sample.
            sox, soy, soz = nee_ref[rt, 0, :], nee_ref[rt, 1, :], nee_ref[rt, 2, :]
            sdx, sdy, sdz = nee_ref[rt, 3, :], nee_ref[rt, 4, :], nee_ref[rt, 5, :]
            c0, c1, c2 = nee_ref[rt, 6, :], nee_ref[rt, 7, :], nee_ref[rt, 8, :]
            r["c"] = (c0, c1, c2)
            r["has_nee"] = r["live"] & (
                (r["flag"] == 1) | (r["flag"] == 2))
            nonzero_c = (c0 != 0.0) | (c1 != 0.0) | (c2 != 0.0)
            r["shadow_bound"] = jnp.where(
                r["has_nee"] & nonzero_c, t_max, neg_inf
            )
            r["shadow"] = (
                sox, soy, soz, sdx, sdy, sdz,
                jnp.float32(1.0) / sdx,
                jnp.float32(1.0) / sdy,
                jnp.float32(1.0) / sdz,
            )
            return r

        def make_process_trace(row):
            u_row, v_row = row["u"], row["v"]
            nb0, nb1 = row["nb0"], row["nb1"]

            def process_trace(st, bt, btri, done=None, unres=None):
                """Fold one trace's results: stop hit lanes for shading;
                for misses accumulate throughput x sky, finish the sample,
                regenerate the pixel's next primary in-register. budget > 0
                also parks budget-interrupted lanes with their carry."""
                (sample, bounce, ox, oy, oz, dx, dy, dz,
                 t0, t1, t2, s0, s1, s2, l0, l1, l2,
                 tfin, trifin, stopped, _) = st[0:21]

                inflight = (sample < nf) & (stopped == 0)
                # Stale-cond flag: any lane inflight at round start. Pure
                # function of the round's INPUT state — hoisted here so the
                # reduce can resolve under the sweep that precedes this fold.
                infl_pre = jnp.max(
                    jnp.where(inflight, 1, 0)).astype(jnp.int32)
                if budget > 0:
                    ufin, dfin = st[24], st[25]
                    unr = inflight & (unres == 1)
                    hit = inflight & (btri >= 0) & (unres == 0)
                    miss = inflight & (btri < 0) & (unres == 0)
                    tfin = jnp.where(hit | unr, bt, tfin)
                    trifin = jnp.where(hit | unr, btri, trifin)
                    stopped = jnp.where(hit | unr, 1, stopped)
                    ufin = jnp.where(unr, 1, ufin)
                    dfin = jnp.where(unr, done, dfin)
                else:
                    hit = inflight & (btri >= 0)
                    tfin = jnp.where(hit, bt, tfin)
                    trifin = jnp.where(hit, btri, trifin)
                    stopped = jnp.where(hit, 1, stopped)
                    miss = inflight & (btri < 0)

                skyr, skyg, skyb = _sky_rows(dx, dy, dz, fscal)
                s0 = jnp.where(miss, s0 + t0 * skyr, s0)
                s1 = jnp.where(miss, s1 + t1 * skyg, s1)
                s2 = jnp.where(miss, s2 + t2 * skyb, s2)
                l0 = jnp.where(miss, l0 + s0, l0)
                l1 = jnp.where(miss, l1 + s1, l1)
                l2 = jnp.where(miss, l2 + s2, l2)
                s0 = jnp.where(miss, jnp.float32(0.0), s0)
                s1 = jnp.where(miss, jnp.float32(0.0), s1)
                s2 = jnp.where(miss, jnp.float32(0.0), s2)
                sample = jnp.where(miss, sample + 1, sample)

                regen = miss & (sample < nf)
                nx, ny = _noise_rows(sample, nb0, nb1, iscal)
                pox, poy, poz, pdx, pdy, pdz = _primary_rows(
                    u_row, v_row, nx, ny, fscal
                )
                ox = jnp.where(regen, pox, ox)
                oy = jnp.where(regen, poy, oy)
                oz = jnp.where(regen, poz, oz)
                dx = jnp.where(regen, pdx, dx)
                dy = jnp.where(regen, pdy, dy)
                dz = jnp.where(regen, pdz, dz)
                one = jnp.float32(1.0)
                t0 = jnp.where(regen, one, t0)
                t1 = jnp.where(regen, one, t1)
                t2 = jnp.where(regen, one, t2)
                bounce = jnp.where(regen, 1, bounce)
                if _STALE_COND:
                    flag = infl_pre
                else:
                    flag = jnp.max(jnp.where(regen, 1, 0)).astype(jnp.int32)
                out = (sample, bounce, ox, oy, oz, dx, dy, dz,
                       t0, t1, t2, s0, s1, s2, l0, l1, l2,
                       tfin, trifin, stopped, flag)
                if budget > 0:
                    # Reset the resume carry: it applies only to the first
                    # round's sweep (regenerated lanes start fresh).
                    lanes = sample.shape[0]
                    out = out + (
                        jnp.full((lanes,), jnp.float32(0.0)) + t_max,
                        jnp.full((lanes,), -1, jnp.int32),
                        jnp.zeros((lanes,), jnp.int32),
                        ufin, dfin,
                    )
                return out

            return process_trace

        def prologue_bookkeeping(row, vis):
            """Post-occlusion-sweep bookkeeping for one row: apply the NEE
            visibility, flush terminate-after-NEE (flag==2) samples,
            regenerate their pixels' next primaries. Returns the main-loop
            init state."""
            sample, bounce, flag = row["sample"], row["bounce"], row["flag"]
            ox, oy, oz = row["o"]
            dx, dy, dz = row["d"]
            t0, t1, t2 = row["t"]
            s0, s1, s2 = row["s"]
            l0, l1, l2 = row["l"]
            live, has_nee = row["live"], row["has_nee"]
            c0, c1, c2 = row["c"]
            lanes = sample.shape[0]
            one = jnp.float32(1.0)

            s0 = jnp.where(has_nee, s0 + c0 * vis, s0)
            s1 = jnp.where(has_nee, s1 + c1 * vis, s1)
            s2 = jnp.where(has_nee, s2 + c2 * vis, s2)

            term = live & (flag == 2)
            l0 = jnp.where(term, l0 + s0, l0)
            l1 = jnp.where(term, l1 + s1, l1)
            l2 = jnp.where(term, l2 + s2, l2)
            s0 = jnp.where(term, jnp.float32(0.0), s0)
            s1 = jnp.where(term, jnp.float32(0.0), s1)
            s2 = jnp.where(term, jnp.float32(0.0), s2)
            sample = jnp.where(term, sample + 1, sample)
            regen0 = term & (sample < nf)
            nx, ny = _noise_rows(sample, row["nb0"], row["nb1"], iscal)
            pox, poy, poz, pdx, pdy, pdz = _primary_rows(
                row["u"], row["v"], nx, ny, fscal)
            ox = jnp.where(regen0, pox, ox)
            oy = jnp.where(regen0, poy, oy)
            oz = jnp.where(regen0, poz, oz)
            dx = jnp.where(regen0, pdx, dx)
            dy = jnp.where(regen0, pdy, dy)
            dz = jnp.where(regen0, pdz, dz)
            t0 = jnp.where(regen0, one, t0)
            t1 = jnp.where(regen0, one, t1)
            t2 = jnp.where(regen0, one, t2)
            bounce = jnp.where(regen0, 1, bounce)

            out = (sample, bounce, ox, oy, oz, dx, dy, dz,
                   t0, t1, t2, s0, s1, s2, l0, l1, l2,
                   jnp.full((lanes,), t_max, jnp.float32),
                   jnp.full((lanes,), -1, jnp.int32),
                   jnp.zeros((lanes,), jnp.int32),
                   jnp.max(jnp.where(sample < nf, 1, 0)).astype(jnp.int32))
            if budget > 0:
                resume = live & (flag == 3)
                out = out + (
                    jnp.where(resume, row["tcar"],
                              jnp.full((lanes,), jnp.float32(0.0)) + t_max),
                    jnp.where(resume, row["tric"],
                              jnp.full((lanes,), -1, jnp.int32)),
                    jnp.where(resume, row["done"],
                              jnp.zeros((lanes,), jnp.int32)),
                    jnp.zeros((lanes,), jnp.int32),
                    jnp.zeros((lanes,), jnp.int32),
                )
            return out

        def pair_prologue(row):
            """Fused first round (single-super flat scenes): the NEE
            occlusion sweep and the first closest sweep share one selection
            loop / one sync per iteration. Terminating lanes regenerate
            BEFORE the sweep (independent of the NEE result); their radiance
            bookkeeping — which needs the visibility — happens after, in the
            same float order as the split path."""
            sample, bounce, flag = row["sample"], row["bounce"], row["flag"]
            ox, oy, oz = row["o"]
            dx, dy, dz = row["d"]
            t0, t1, t2 = row["t"]
            s0, s1, s2 = row["s"]
            l0, l1, l2 = row["l"]
            live, has_nee = row["live"], row["has_nee"]
            c0, c1, c2 = row["c"]
            lanes = sample.shape[0]
            one = jnp.float32(1.0)

            term = live & (flag == 2)
            sample = jnp.where(term, sample + 1, sample)
            regen0 = term & (sample < nf)
            nx, ny = _noise_rows(sample, row["nb0"], row["nb1"], iscal)
            pox, poy, poz, pdx, pdy, pdz = _primary_rows(
                row["u"], row["v"], nx, ny, fscal)
            ox = jnp.where(regen0, pox, ox)
            oy = jnp.where(regen0, poy, oy)
            oz = jnp.where(regen0, poz, oz)
            dx = jnp.where(regen0, pdx, dx)
            dy = jnp.where(regen0, pdy, dy)
            dz = jnp.where(regen0, pdz, dz)
            t0 = jnp.where(regen0, one, t0)
            t1 = jnp.where(regen0, one, t1)
            t2 = jnp.where(regen0, one, t2)
            bounce = jnp.where(regen0, 1, bounce)

            inflight0 = sample < nf
            bound0 = jnp.where(inflight0, t_max, neg_inf)
            ix = jnp.float32(1.0) / dx
            iy = jnp.float32(1.0) / dy
            iz = jnp.float32(1.0) / dz
            bt0, btri0, occ = _pair_tile_sweep(
                (ox, oy, oz, dx, dy, dz, ix, iy, iz), bound0,
                row["shadow"], row["shadow_bound"],
                start_ref, cl_planes_ref, table_hbm, pair_entry, tbuf,
                cache_tag, sem,
                super_min_ref=super_min_ref, super_max_ref=super_max_ref,
            )
            vis = jnp.where(occ == 0, jnp.float32(1.0), jnp.float32(0.0))
            s0 = jnp.where(has_nee, s0 + c0 * vis, s0)
            s1 = jnp.where(has_nee, s1 + c1 * vis, s1)
            s2 = jnp.where(has_nee, s2 + c2 * vis, s2)
            l0 = jnp.where(term, l0 + s0, l0)
            l1 = jnp.where(term, l1 + s1, l1)
            l2 = jnp.where(term, l2 + s2, l2)
            s0 = jnp.where(term, jnp.float32(0.0), s0)
            s1 = jnp.where(term, jnp.float32(0.0), s1)
            s2 = jnp.where(term, jnp.float32(0.0), s2)

            st = (sample, bounce, ox, oy, oz, dx, dy, dz,
                  t0, t1, t2, s0, s1, s2, l0, l1, l2,
                  jnp.full((lanes,), t_max, jnp.float32),
                  jnp.full((lanes,), -1, jnp.int32),
                  jnp.zeros((lanes,), jnp.int32), jnp.int32(0))
            return make_process_trace(row)(st, bt0, btri0)

        def store_row(rt, st):
            (sample, bounce, ox, oy, oz, dx, dy, dz,
             t0, t1, t2, s0, s1, s2, l0, l1, l2,
             tfin, trifin, stopped, _) = st[0:21]
            if budget > 0:
                counters_out[rt, 2, :] = st[24]  # unres
                counters_out[rt, 3, :] = st[25]  # done mask
            counters_out[rt, 0, :] = sample
            counters_out[rt, 1, :] = bounce
            ray_out[rt, 0, :] = ox
            ray_out[rt, 1, :] = oy
            ray_out[rt, 2, :] = oz
            ray_out[rt, 3, :] = dx
            ray_out[rt, 4, :] = dy
            ray_out[rt, 5, :] = dz
            shade_out[rt, 0, :] = t0
            shade_out[rt, 1, :] = t1
            shade_out[rt, 2, :] = t2
            shade_out[rt, 3, :] = s0
            shade_out[rt, 4, :] = s1
            shade_out[rt, 5, :] = s2
            shade_out[rt, 6, :] = l0
            shade_out[rt, 7, :] = l1
            shade_out[rt, 8, :] = l2
            t_out[rt, 0, :] = tfin
            tri_out[rt, 0, :] = trifin

        def per_group(gi, _):
            rts = [gi * kr + k for k in range(kr)]
            rows = [load_row(rt) for rt in rts]
            pts = [make_process_trace(row) for row in rows]

            if pair:
                sts = [pair_prologue(rows[0])]
            else:
                # --- split prologue: occlusion sweep(s), then terminate-
                # after-NEE bookkeeping and regeneration per row.
                if prebuilt:
                    occs = [_any_tile_sweep_prebuilt(
                        rows[0]["shadow"], rows[0]["shadow_bound"],
                        cl_planes_ref, table_hbm, super_entry, cl_entry,
                        cl_all, tbuf, cache_tag, sem, num_supers,
                        super_min_ref, super_max_ref,
                    )]
                elif grouped:
                    occs = _any_tile_sweep_grouped(
                        [row["shadow"] for row in rows],
                        [row["shadow_bound"] for row in rows],
                        super_min_ref, super_max_ref, cl_planes_ref,
                        table_hbm, super_entries, cl_entries, tbuf,
                        cache_tag, sem, num_supers, cur_entry=cur_entry,
                    )
                else:
                    occs = [_any_tile_sweep(
                        rows[0]["shadow"], rows[0]["shadow_bound"],
                        start_ref, super_min_ref, super_max_ref,
                        cl_planes_ref, table_hbm, super_entry, cl_entry,
                        tbuf, cache_tag, sem, num_supers=num_supers,
                    )]
                sts = [
                    prologue_bookkeeping(
                        rows[k],
                        jnp.where(occs[k] == 0, jnp.float32(1.0),
                                  jnp.float32(0.0)),
                    )
                    for k in range(kr)
                ]

            # --- main loop: trace to the next hit, consuming misses.
            def cond(flat):
                tot = flat[_FLAG]
                for k in range(1, kr):
                    tot = tot + flat[k * _L + _FLAG]
                return tot > 0

            def one_round(flat):
                sts = [flat[k * _L:(k + 1) * _L] for k in range(kr)]
                rays9 = []
                bounds = []
                for st in sts:
                    (sample, bounce, ox, oy, oz, dx, dy, dz) = st[0:8]
                    stopped = st[19]
                    inflight = (sample < nf) & (stopped == 0)
                    # budget carry: the resume bound (t_max except for
                    # flag==3 lanes in the dispatch's first round).
                    b0 = st[21] if budget > 0 else t_max
                    bounds.append(jnp.where(inflight, b0, neg_inf))
                    rays9.append((
                        ox, oy, oz, dx, dy, dz,
                        jnp.float32(1.0) / dx,
                        jnp.float32(1.0) / dy,
                        jnp.float32(1.0) / dz,
                    ))
                done = unres = None
                if prebuilt:
                    bt, btri = _closest_tile_sweep_prebuilt(
                        rays9[0], bounds[0], cl_planes_ref, start_ref,
                        table_hbm, super_entry, cl_entry, cl_all, tbuf,
                        cache_tag, sem, num_supers,
                        super_min_ref, super_max_ref,
                    )
                    bts, btris = [bt], [btri]
                elif grouped and budget > 0:
                    bts, btris, done, unres = _closest_tile_sweep_grouped(
                        rays9, bounds,
                        super_min_ref, super_max_ref, cl_planes_ref,
                        start_ref, table_hbm, super_entries, cl_entries,
                        tbuf, cache_tag, sem, num_supers,
                        cur_entry=cur_entry,
                        budget=budget, btri0_k=[sts[0][22]],
                        done_mask=sts[0][23],
                    )
                elif grouped:
                    bts, btris = _closest_tile_sweep_grouped(
                        rays9, bounds,
                        super_min_ref, super_max_ref, cl_planes_ref,
                        start_ref, table_hbm, super_entries, cl_entries,
                        tbuf, cache_tag, sem, num_supers,
                        cur_entry=cur_entry,
                    )
                else:
                    bt, btri = _closest_tile_sweep(
                        rays9[0], bounds[0],
                        start_ref, super_min_ref, super_max_ref,
                        cl_planes_ref, table_hbm, super_entry, cl_entry,
                        tbuf, cache_tag, sem, num_supers=num_supers,
                    )
                    bts, btris = [bt], [btri]
                out = []
                for k in range(kr):
                    if budget > 0:
                        out.extend(pts[k](sts[k], bts[k], btris[k],
                                          done, unres))
                    else:
                        out.extend(pts[k](sts[k], bts[k], btris[k]))
                return tuple(out)

            def body(flat):
                # Rounds per while iteration: each scalar/vector sync
                # (loop condition + selection argmins) costs as much as a
                # sweep, and all-miss tiles (pure sky) run one round per
                # sample — unrolling amortizes that overhead. A round with
                # no in-flight lanes degenerates to a rejected sweep.
                for _ in range(_ROUND_UNROLL):
                    flat = one_round(flat)
                return flat

            flat = tuple(x for st in sts for x in st)
            flat = jax.lax.while_loop(cond, body, flat)
            for k, rt in enumerate(rts):
                store_row(rt, flat[k * _L:(k + 1) * _L])
            return 0

        jax.lax.fori_loop(0, rt_count // kr, per_group, 0)

    return kernel


def _make_path_kernel_segs(leaf: int, num_supers: int, rt_count: int,
                           segs: int):
    """Multi-hit-segment persistent path kernel (VERDICT r4 #2, flat
    sweeps / small scenes): each lane PIPELINES `segs` independent paths
    of its pixel. A lane whose active path stops at a surface hit parks
    that path's segment in its slot and immediately continues tracing its
    next slot (a pending continuation or a freshly regenerated sample)
    instead of idling until every tile-mate stops — so each dispatch
    returns `segs` hit segments per lane and the outer XLA loop runs
    ~1/segs as many iterations, with per-round occupancy harvested from
    the straggler tail. Reference analog: the megakernel never leaves the
    GPU between bounces (reference_path_tracer.wgsl:180-234).

    MEASURED LOSS on TPU (v5e driver bench, 2026-08-21): SEGS=2 55.12 and
    SEGS=4 54.18 vs baseline 57.99/56.96 Mrays/s — identical exact ray
    counts and quality RMSE, so this is a clean A/B. The mechanism the
    restructure targets barely exists: prof_p1body already measured the
    per-dispatch loop glue at ~zero, the NEE+shade is row-bound (K slots
    = K x rows, no amortization), and the harvestable straggler idle is
    smaller than the K-way active-slot selects in every sweep round plus
    the K per-dispatch NEE prologue sweeps. Kept opt-in as the committed
    refutation of the round-4 ask.

    Slot state (per lane, per slot j): sample index, bounce, pending-NEE
    flag, ray, throughput, per-sample radiance. Shared per lane: the
    sample ALLOCATOR (next unassigned sample of the pixel), lane radiance,
    pixel uv + blue-noise base. Each sample's radiance is bit-identical to
    the single-slot kernel (the noise stream depends only on the sample
    index); only the f32 ADD ORDER into the lane accumulator changes —
    the same few-ulp regrouping the phase compaction already has."""

    def kernel(
        salloc_ref, pix_ref, lrad_ref, scnt_ref, sray_ref, sthr_ref,
        snee_ref,
        fscal, iscal, start_ref, super_min_ref, super_max_ref,
        cl_planes_ref, table_hbm,
        salloc_out, lrad_out, ocnt_out, oray_out, othr_out, t_out,
        super_entry, cl_entry, tbuf, cache_tag, sem,
    ):
        g = pl.program_id(0)

        @pl.when(g == 0)
        def _():
            cache_tag[0] = jnp.int32(-1)

        nf = iscal[2]
        t_max = fscal[_F_T_MAX]
        neg_inf = jnp.float32(-jnp.inf)
        _S = 17  # per-slot flat-state width

        def per_tile(rt, _):
            u_row, v_row = pix_ref[rt, 0, :], pix_ref[rt, 1, :]
            nb0, nb1 = pix_ref[rt, 2, :], pix_ref[rt, 3, :]
            salloc = salloc_ref[rt, 0, :]
            lrad = [lrad_ref[rt, a, :] for a in range(3)]
            lanes = salloc.shape[0]
            one = jnp.float32(1.0)

            slots = []
            for j in range(segs):
                s = {
                    "ssample": scnt_ref[rt, 3 * j + 0, :],
                    "bounce": scnt_ref[rt, 3 * j + 1, :],
                    "flag": scnt_ref[rt, 3 * j + 2, :],
                    "o": [sray_ref[rt, 6 * j + a, :] for a in range(3)],
                    "d": [sray_ref[rt, 6 * j + 3 + a, :] for a in range(3)],
                    "thr": [sthr_ref[rt, 6 * j + a, :] for a in range(3)],
                    "srad": [sthr_ref[rt, 6 * j + 3 + a, :] for a in range(3)],
                }
                slots.append(s)

            # --- prologue, per slot: NEE occlusion sweep, visibility add,
            # terminate-after-NEE flush, slot regeneration.
            for j, s in enumerate(slots):
                live = s["ssample"] < nf
                so = [snee_ref[rt, 9 * j + a, :] for a in range(3)]
                sd = [snee_ref[rt, 9 * j + 3 + a, :] for a in range(3)]
                c = [snee_ref[rt, 9 * j + 6 + a, :] for a in range(3)]
                has_nee = live & (s["flag"] > 0)
                nonzero_c = (c[0] != 0.0) | (c[1] != 0.0) | (c[2] != 0.0)
                sb = jnp.where(has_nee & nonzero_c, t_max, neg_inf)
                occ = _any_tile_sweep(
                    (so[0], so[1], so[2], sd[0], sd[1], sd[2],
                     one / sd[0], one / sd[1], one / sd[2]), sb,
                    start_ref, super_min_ref, super_max_ref, cl_planes_ref,
                    table_hbm, super_entry, cl_entry, tbuf, cache_tag, sem,
                    num_supers=num_supers,
                )
                vis = jnp.where(occ == 0, one, jnp.float32(0.0))
                for a in range(3):
                    s["srad"][a] = jnp.where(
                        has_nee, s["srad"][a] + c[a] * vis, s["srad"][a])
                term = live & (s["flag"] == 2)
                for a in range(3):
                    lrad[a] = jnp.where(term, lrad[a] + s["srad"][a], lrad[a])
                    s["srad"][a] = jnp.where(
                        term, jnp.float32(0.0), s["srad"][a])
                new_s = jnp.where(term, salloc, s["ssample"])
                salloc = jnp.where(term, salloc + 1, salloc)
                s["ssample"] = new_s
                regen0 = term & (new_s < nf)
                nx, ny = _noise_rows(new_s, nb0, nb1, iscal)
                p6 = _primary_rows(u_row, v_row, nx, ny, fscal)
                for a in range(3):
                    s["o"][a] = jnp.where(regen0, p6[a], s["o"][a])
                    s["d"][a] = jnp.where(regen0, p6[3 + a], s["d"][a])
                    s["thr"][a] = jnp.where(regen0, one, s["thr"][a])
                s["bounce"] = jnp.where(regen0, 1, s["bounce"])
                s["tfin"] = jnp.full((lanes,), t_max, jnp.float32)
                s["trifin"] = jnp.full((lanes,), -1, jnp.int32)
                s["parked"] = jnp.zeros((lanes,), jnp.int32)

            # --- main loop: trace each lane's first unparked inflight slot;
            # hits park the slot, misses fold sky + regenerate in place.
            def flatten(salloc, lrad, slots, flag):
                st = [salloc] + lrad
                for s in slots:
                    st += ([s["ssample"], s["bounce"]] + s["o"] + s["d"]
                           + s["thr"] + s["srad"]
                           + [s["tfin"], s["trifin"], s["parked"]])
                st.append(flag)
                return tuple(st)

            def unflatten(fl):
                salloc, lrad = fl[0], list(fl[1:4])
                slots = []
                for j in range(segs):
                    b = 4 + _S * j
                    slots.append({
                        "ssample": fl[b], "bounce": fl[b + 1],
                        "o": list(fl[b + 2:b + 5]),
                        "d": list(fl[b + 5:b + 8]),
                        "thr": list(fl[b + 8:b + 11]),
                        "srad": list(fl[b + 11:b + 14]),
                        "tfin": fl[b + 14], "trifin": fl[b + 15],
                        "parked": fl[b + 16],
                    })
                return salloc, lrad, slots

            def infl_flag(slots):
                infl = None
                for s in slots:
                    i = (s["ssample"] < nf) & (s["parked"] == 0)
                    infl = i if infl is None else (infl | i)
                return jnp.max(jnp.where(infl, 1, 0)).astype(jnp.int32)

            def cond(fl):
                return fl[-1] > 0

            def one_round(fl):
                salloc, lrad, slots = unflatten(fl)
                act = jnp.full((lanes,), segs, jnp.int32)
                for j in reversed(range(segs)):
                    infl = (slots[j]["ssample"] < nf) & (slots[j]["parked"] == 0)
                    act = jnp.where(infl, j, act)

                def sel(field, a):
                    out = slots[0][field][a]
                    for j in range(1, segs):
                        out = jnp.where(act == j, slots[j][field][a], out)
                    return out

                ox, oy, oz = (sel("o", a) for a in range(3))
                dx, dy, dz = (sel("d", a) for a in range(3))
                bound = jnp.where(act < segs, t_max, neg_inf)
                bt, btri = _closest_tile_sweep(
                    (ox, oy, oz, dx, dy, dz, one / dx, one / dy, one / dz),
                    bound,
                    start_ref, super_min_ref, super_max_ref, cl_planes_ref,
                    table_hbm, super_entry, cl_entry, tbuf, cache_tag, sem,
                    num_supers=num_supers,
                )
                hit_any = btri >= 0
                miss_any = (act < segs) & (btri < 0)
                sky = _sky_rows(dx, dy, dz, fscal)
                # One regen allocation serves the (single) missing slot of
                # each missing lane.
                new_s = salloc
                nx, ny = _noise_rows(new_s, nb0, nb1, iscal)
                p6 = _primary_rows(u_row, v_row, nx, ny, fscal)
                salloc = jnp.where(miss_any, salloc + 1, salloc)
                for j, s in enumerate(slots):
                    mine = act == j
                    hit = mine & hit_any
                    s["tfin"] = jnp.where(hit, bt, s["tfin"])
                    s["trifin"] = jnp.where(hit, btri, s["trifin"])
                    s["parked"] = jnp.where(hit, 1, s["parked"])
                    miss = mine & miss_any
                    for a in range(3):
                        sa = s["srad"][a] + s["thr"][a] * sky[a]
                        lrad[a] = jnp.where(miss, lrad[a] + sa, lrad[a])
                        s["srad"][a] = jnp.where(
                            miss, jnp.float32(0.0), s["srad"][a])
                    s["ssample"] = jnp.where(miss, new_s, s["ssample"])
                    regen = miss & (new_s < nf)
                    for a in range(3):
                        s["o"][a] = jnp.where(regen, p6[a], s["o"][a])
                        s["d"][a] = jnp.where(regen, p6[3 + a], s["d"][a])
                        s["thr"][a] = jnp.where(regen, one, s["thr"][a])
                    s["bounce"] = jnp.where(regen, 1, s["bounce"])
                return flatten(salloc, lrad, slots, infl_flag(slots))

            fl = flatten(salloc, lrad, slots, infl_flag(slots))
            fl = jax.lax.while_loop(cond, one_round, fl)
            salloc, lrad, slots = unflatten(fl)

            salloc_out[rt, 0, :] = salloc
            for a in range(3):
                lrad_out[rt, a, :] = lrad[a]
            for j, s in enumerate(slots):
                ocnt_out[rt, 3 * j + 0, :] = s["ssample"]
                ocnt_out[rt, 3 * j + 1, :] = s["bounce"]
                ocnt_out[rt, 3 * j + 2, :] = s["trifin"]
                for a in range(3):
                    oray_out[rt, 6 * j + a, :] = s["o"][a]
                    oray_out[rt, 6 * j + 3 + a, :] = s["d"][a]
                    othr_out[rt, 6 * j + a, :] = s["thr"][a]
                    othr_out[rt, 6 * j + 3 + a, :] = s["srad"][a]
                t_out[rt, j, :] = s["tfin"]
            return 0

        jax.lax.fori_loop(0, rt_count, per_tile, 0)

    return kernel


def _pack_fscal(camera, sky, t_max, inv_dims) -> jnp.ndarray:
    from ..render.pathtracer import SOLAR_COS_THETA_MAX, SOLAR_INV_PDF
    from ..render.sampling import pixar_onb

    sun = jnp.asarray(sky.sun_direction, jnp.float32).reshape(3)
    sun_u, sun_v, _ = pixar_onb(sun)
    parts = [
        jnp.asarray(camera.origin, jnp.float32).reshape(3),
        jnp.asarray(camera.lower_left_corner, jnp.float32).reshape(3),
        jnp.asarray(camera.horizontal, jnp.float32).reshape(3),
        jnp.asarray(camera.vertical, jnp.float32).reshape(3),
        jnp.asarray(camera.right, jnp.float32).reshape(3),
        jnp.asarray(camera.up, jnp.float32).reshape(3),
        jnp.asarray(camera.lens_radius, jnp.float32).reshape(1),
        jnp.asarray(t_max, jnp.float32).reshape(1),
        sun,
        jnp.asarray(sky.sky_radiances, jnp.float32).reshape(3),
        jnp.asarray(sky.params, jnp.float32).reshape(27),
        jnp.asarray(inv_dims, jnp.float32).reshape(2),
        sun_u.reshape(3),
        sun_v.reshape(3),
        jnp.asarray(sky.solar_radiances, jnp.float32).reshape(3),
        jnp.asarray(SOLAR_COS_THETA_MAX, jnp.float32).reshape(1),
        jnp.asarray(SOLAR_INV_PDF, jnp.float32).reshape(1),
    ]
    f = jnp.concatenate(parts)
    assert f.shape == (_F_LEN,)
    return f


def _pack_rows(arrs, tiles, tile):
    """Stack (B,) arrays as (tiles, len(arrs), tile) channel blocks."""
    rows = jnp.stack(arrs, axis=1)  # (B, C)
    return rows.reshape(tiles, tile, len(arrs)).transpose(0, 2, 1)


# ---------------------------------------------------------------------------
# IN-KERNEL SHADING (small flat scenes): the persistent path kernel runs the
# ENTIRE path loop on-chip — surface interaction, texture albedo, NEE light
# sampling and the cosine-weighted scatter included — so one kernel dispatch
# renders every sample of every lane with no XLA round-trips and no hit-lane
# idling (a lane that hits shades immediately and continues, instead of
# stopping until all tile-mates stop).
#
# The HBM gathers the split kernel returned to XLA for become MXU gathers:
#  * per-triangle attributes (positions/normals/uvs/texture id) ride as a
#    3-way bf16-split table — hi/mid/lo planes with hi+mid+lo == f32 value
#    EXACTLY — contracted against a one-hot (T, TILE) matrix; the f32 sum of
#    the three products reconstructs the f32 gather bit-exactly (probed on
#    v5e: exact), because each split part is exact in bf16 and the one-hot
#    leaves one nonzero term per lane;
#  * texels ride as three (128, R) bf16 channel planes (u8 values are exact
#    in bf16): a (128, R) x (R, TILE) matmul fetches each lane's 128-texel
#    column, a sublane one-hot reduce picks the texel — also exact;
#  * texture descriptors (w, h, offset ints) are a static unrolled select
#    chain over SMEM scalars.
# Every other shading op (pow 2.2, sqrt/sin/cos, the mantissa offset bitcast)
# lowers bit-identically to XLA on TPU (probed), so the in-kernel shade
# matches render/pathtracer._nee_and_continuation float-for-float.
# ---------------------------------------------------------------------------

# VMEM budget for the resident shade tables (attr splits + texel planes,
# bytes). Scenes over budget keep the split kernel + XLA shade.
_INKERNEL_BUDGET = int(os.environ.get("RAYFINDER_INKERNEL_BUDGET", str(6 << 20)))


def _shade_table_sizes(scene):
    t = scene.tri_positions.shape[0]
    s8 = -(-(-(-t // 128)) // 8) * 8  # ceil(T/128) rounded up to 8 sublanes
    p = scene.texels.shape[0]
    r = max(1, -(-p // 128))
    return s8, r


def inkernel_shade_ok(scene) -> bool:
    """Do the shade tables fit the VMEM budget (attrs (25, S8, 128) f32 +
    texels 3x(128,R) bf16)?"""
    s8, r = _shade_table_sizes(scene)
    return 25 * s8 * 128 * 4 + 3 * 128 * r * 2 <= _INKERNEL_BUDGET


def _shade_tables(scene):
    """Build the kernel-resident shading tables.

    Returns (attrs (25, S8, 128) f32, tex_planes (3, 128, R) bf16,
    desc (K, 3) i32). Attr plane r holds attribute r of triangle g at
    [r, g >> 7, g & 127] — the in-kernel gather lane-shuffles the low 7
    index bits (tpu.dynamic_gather along lanes, any row count) and
    mask-reduces the row bits (sublane dynamic_gather only works within one
    (8, 128) register, probed on v5e). Rows 0-8 positions, 9-17 normals,
    18-23 uvs, 24 texture id as a plain float."""
    t = scene.tri_positions.shape[0]
    s8, r = _shade_table_sizes(scene)
    attr = jnp.concatenate(
        [
            scene.tri_positions.reshape(t, 9),
            scene.tri_normals.reshape(t, 9),
            scene.tri_uvs.reshape(t, 6),
            scene.tri_texture.astype(jnp.float32)[:, None],
        ],
        axis=1,
    )  # (T, 25)
    attrs = jnp.zeros((25, s8 * 128), jnp.float32).at[:, :t].set(attr.T)
    attrs = attrs.reshape(25, s8, 128)

    texels = scene.texels
    p = texels.shape[0]
    pad = r * 128 - p
    if pad:
        texels = jnp.concatenate([texels, jnp.zeros((pad,), texels.dtype)])
    planes = []
    for shift in (16, 8, 0):  # r, g, b (texture_eval.py byte order)
        chan = ((texels >> jnp.uint32(shift)) & jnp.uint32(0xFF)).astype(
            jnp.float32
        )
        planes.append(chan.reshape(r, 128).T.astype(jnp.bfloat16))
    tex_planes = jnp.stack(planes)  # (3, 128, R)
    return attrs, tex_planes, scene.tex_desc


def _offset_rows(p, n):
    """offset_ray per component (render/intersect.py offset_ray, reference
    ray_intersection.cpp:17-35): integer-mantissa offset away from the
    surface, fixed epsilon near the origin."""
    offset = (np.float32(256.0) * n).astype(jnp.int32)
    p_bits = jax.lax.bitcast_convert_type(p, jnp.int32)
    po_bits = p_bits + jnp.where(p < 0, -offset, offset)
    po = jax.lax.bitcast_convert_type(po_bits, jnp.float32)
    return jnp.where(
        jnp.abs(p) < np.float32(1.0 / 32.0),
        p + np.float32(1.0 / 65536.0) * n,
        po,
    )


def _onb_rows(nx, ny, nz):
    """pixar_onb on row vectors (render/sampling.py:14-28), returning the
    u and v basis rows (n is the input)."""
    one = jnp.float32(1.0)
    s = jnp.where(nz >= 0.0, one, -one)
    a = -one / (s + nz)
    b = nx * ny * a
    ux = one + s * nx * nx * a
    uy = s * b
    uz = -s * nx
    vx = b
    vy = s + ny * ny * a
    vz = -ny
    return (ux, uy, uz), (vx, vy, vz)


def _isfinite_rows(x):
    return jnp.abs(x) < jnp.float32(np.inf)


def _shade_rows(
    hit, sample, bounce,
    ox, oy, oz, dx, dy, dz, t0, t1, t2,
    nb0, nb1, btri,
    fscal, iscal, desc_ref, attr_buf, tex_buf,
    num_textures: int,
):
    """In-kernel mirror of render/pathtracer._surface_interaction +
    eval_texture + _nee_and_continuation for lanes stopped at a hit.

    Float-for-float the same arithmetic as the XLA shade (same op order;
    gathers/transcendentals probed bit-exact on v5e). Returns
    (flag, ox, oy, oz, dx, dy, dz, t0, t1, t2, bounce,
    sox, soy, soz, sdx, sdy, sdz, c0, c1, c2).
    """
    tile = btri.shape[0]
    s8 = attr_buf.shape[1]
    one = jnp.float32(1.0)
    park = jnp.float32(1e30)

    # --- attribute gather: per-lane (row, col) split of the triangle index;
    # cols via tpu.dynamic_gather lane shuffle, rows via a shared mask
    # reduce (one nonzero term per lane -> exact f32) ---
    safe_tri = jnp.maximum(btri, 0)
    arow = jnp.right_shift(safe_tri, 7)
    acol = jnp.bitwise_and(safe_tri, 127)
    acolb = jnp.broadcast_to(acol[None, :], (s8, tile))
    io_a = jax.lax.broadcasted_iota(jnp.int32, (s8, tile), 0)
    amask = io_a == arow[None, :]
    zero_st = jnp.float32(0.0)

    def fetch(r):
        y = jnp.take_along_axis(attr_buf[r], acolb, axis=1)
        return jnp.sum(jnp.where(amask, y, zero_st), axis=0)

    g = [fetch(r) for r in range(25)]  # 25 (tile,) lane rows
    v0x, v0y, v0z = g[0], g[1], g[2]
    v1x, v1y, v1z = g[3], g[4], g[5]
    v2x, v2y, v2z = g[6], g[7], g[8]

    # --- Möller-Trumbore re-derivation of (u, v) (_surface_interaction) ---
    e1x, e1y, e1z = v1x - v0x, v1y - v0y, v1z - v0z
    e2x, e2y, e2z = v2x - v0x, v2y - v0y, v2z - v0z
    hx = dy * e2z - dz * e2y
    hy = dz * e2x - dx * e2z
    hz = dx * e2y - dy * e2x
    det = e1x * hx + e1y * hy + e1z * hz
    inv_det = one / det
    sx, sy, sz = ox - v0x, oy - v0y, oz - v0z
    b1 = inv_det * (sx * hx + sy * hy + sz * hz)
    qx = sy * e1z - sz * e1y
    qy = sz * e1x - sx * e1z
    qz = sx * e1y - sy * e1x
    b2 = inv_det * (dx * qx + dy * qy + dz * qz)

    px = v0x + b1 * e1x + b2 * e2x
    py = v0y + b1 * e1y + b2 * e2y
    pz = v0z + b1 * e1z + b2 * e2z
    gnx = e1y * e2z - e1z * e2y
    gny = e1z * e2x - e1x * e2z
    gnz = e1x * e2y - e1y * e2x
    norm = jnp.sqrt(gnx * gnx + gny * gny + gnz * gnz)
    gnx, gny, gnz = gnx / norm, gny / norm, gnz / norm
    pox = _offset_rows(px, gnx)
    poy = _offset_rows(py, gny)
    poz = _offset_rows(pz, gnz)

    b0 = one - b1 - b2
    nx = b0 * g[9] + b1 * g[12] + b2 * g[15]
    ny = b0 * g[10] + b1 * g[13] + b2 * g[16]
    nz = b0 * g[11] + b1 * g[14] + b2 * g[17]
    uvx = b0 * g[18] + b1 * g[20] + b2 * g[22]
    uvy = b0 * g[19] + b1 * g[21] + b2 * g[23]
    ti = g[24].astype(jnp.int32)

    # --- texture lookup (texture_eval.eval_texture) ---
    wi_ = jnp.zeros((tile,), jnp.int32)
    hi_ = jnp.zeros((tile,), jnp.int32)
    off_ = jnp.zeros((tile,), jnp.int32)
    for k in range(num_textures):
        m = ti == k
        wi_ = jnp.where(m, desc_ref[k, 0], wi_)
        hi_ = jnp.where(m, desc_ref[k, 1], hi_)
        off_ = jnp.where(m, desc_ref[k, 2], off_)
    uf = uvx - jnp.floor(uvx)
    vf = uvy - jnp.floor(uvy)
    tj = (uf * wi_.astype(jnp.float32)).astype(jnp.int32)
    tii = (vf * hi_.astype(jnp.float32)).astype(jnp.int32)
    tj = jnp.clip(tj, 0, wi_ - 1)
    tii = jnp.clip(tii, 0, hi_ - 1)
    gidx = off_ + tii * wi_ + tj
    trow = jnp.right_shift(gidx, 7)
    tcol = jnp.bitwise_and(gidx, 127)

    r_rows = tex_buf.shape[-1]
    io_r = jax.lax.broadcasted_iota(jnp.int32, (r_rows, tile), 0)
    oh_row = (io_r == trow[None, :]).astype(jnp.bfloat16)
    io_s = jax.lax.broadcasted_iota(jnp.int32, (128, tile), 0)
    colmask = io_s == tcol[None, :]
    albedo = []
    for c in range(3):
        m1 = jax.lax.dot_general(
            tex_buf[c], oh_row, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (128, tile)
        val = jnp.sum(jnp.where(colmask, m1, jnp.float32(0.0)), axis=0)
        albedo.append(
            jnp.power(val / jnp.float32(255.0), jnp.float32(2.2))
        )

    # --- NEE: solar-disk cone sample (_nee_and_continuation) ---
    nsx, nsy = _noise_rows(sample, nb0, nb1, iscal)
    ct = one - nsx * (one - fscal[_F_COS_THETA_MAX])
    st = jnp.sqrt(one - ct * ct)
    phi = _TWO_PI * nsy
    lx, ly, lz = jnp.cos(phi) * st, jnp.sin(phi) * st, ct
    ldx = lx * fscal[_F_SUN_U] + ly * fscal[_F_SUN_V] + lz * fscal[_F_SUN]
    ldy = (lx * fscal[_F_SUN_U + 1] + ly * fscal[_F_SUN_V + 1]
           + lz * fscal[_F_SUN + 1])
    ldz = (lx * fscal[_F_SUN_U + 2] + ly * fscal[_F_SUN_V + 2]
           + lz * fscal[_F_SUN + 2])

    cos_term = nx * ldx + ny * ldy + nz * ldz
    p_ok = _isfinite_rows(pox) & _isfinite_rows(poy) & _isfinite_rows(poz)
    sh_ok = hit & p_ok
    sox = jnp.where(sh_ok, pox, park)
    soy = jnp.where(sh_ok, poy, park)
    soz = jnp.where(sh_ok, poz, park)
    zero = jnp.float32(0.0)
    thr = (t0, t1, t2)
    contrib = []
    for c in range(3):
        brdf = albedo[c] * _FRAC_1_PI
        cc = (((thr[c] * fscal[_F_SOLAR + c]) * brdf) * cos_term) \
            * fscal[_F_INV_PDF]
        contrib.append(jnp.where(hit, cc, zero))

    # --- scatter: cosine-weighted hemisphere about the shading normal ---
    st2 = jnp.sqrt(one - nsx)
    phi2 = _TWO_PI * nsy
    cx, cy, cz = jnp.cos(phi2) * st2, jnp.sin(phi2) * st2, jnp.sqrt(nsx)
    (bux, buy, buz), (bvx, bvy, bvz) = _onb_rows(nx, ny, nz)
    wix = cx * bux + cy * bvx + cz * nx
    wiy = cx * buy + cy * bvy + cz * ny
    wiz = cx * buz + cy * bvz + cz * nz
    ray_ok = (_isfinite_rows(wix) & _isfinite_rows(wiy)
              & _isfinite_rows(wiz) & p_ok)
    nb = iscal[3]
    scatter = hit & (bounce < nb) & ray_ok
    flag = jnp.where(hit, jnp.where(scatter, 1, 2), 0).astype(jnp.int32)
    ox = jnp.where(scatter, pox, ox)
    oy = jnp.where(scatter, poy, oy)
    oz = jnp.where(scatter, poz, oz)
    dx = jnp.where(scatter, wix, dx)
    dy = jnp.where(scatter, wiy, dy)
    dz = jnp.where(scatter, wiz, dz)
    t0 = jnp.where(scatter, t0 * albedo[0], t0)
    t1 = jnp.where(scatter, t1 * albedo[1], t1)
    t2 = jnp.where(scatter, t2 * albedo[2], t2)
    bounce = jnp.where(scatter, bounce + 1, bounce)
    return (flag, ox, oy, oz, dx, dy, dz, t0, t1, t2, bounce,
            sox, soy, soz, ldx, ldy, ldz,
            contrib[0], contrib[1], contrib[2])


@partial(jax.jit, static_argnames=("tile_override",))
def pallas_trace_regen(
    scene, camera, sky, u, v_tex, noise_base, inv_dims, frame_base, spp_dyn,
    num_frames_dyn, t_max,
    sample, bounce, flag, origin, direction, thr, srad, lrad,
    shadow_o, shadow_d, contrib,
    tile_override=None,
    done_mask=None, tri_carry=None, t_carry=None,
):
    """Advance every lane to its next HIT or exhaust its samples.

    The kernel first resolves the previous segment's pending NEE light
    sample (flag/shadow_o/shadow_d/contrib; see _make_path_kernel), then
    terminates flag==2 paths, then loops trace->sky->regen until each lane
    stops at a hit or runs out of samples. All per-lane arrays are (B,) /
    (B, k); spp_dyn / num_frames_dyn / frame_base are traced int32 scalars
    (no recompile per value). Returns (sample, bounce, origin, direction,
    thr, srad, lrad, t, tri): tri >= 0 marks lanes stopped at a surface hit
    awaiting shading; all other live lanes have consumed every remaining
    sample (their sky radiance is already folded into lrad).
    """
    num_rays = u.shape[0]
    # Full-width phases are sync-bound (mostly in-kernel sky/regen rounds)
    # and want BIG tiles; compacted bounce phases are divergence-bound and
    # want small ones. The caller picks per phase (pathtracer.py).
    tile, rt = tile_override or _pick_tile(scene.cluster_tris.shape[0])
    padded = -(-num_rays // (tile * rt)) * (tile * rt)
    pad = padded - num_rays

    def pad1(a, value):
        if pad == 0:
            return a
        return jnp.concatenate([a, jnp.full((pad,) + a.shape[1:], value, a.dtype)])

    nf_big = jnp.int32(2**30)
    u_p = pad1(u, 0.5)
    v_p = pad1(v_tex, 0.5)
    nb_p = pad1(noise_base, 0.0)
    sample_p = pad1(sample, nf_big)  # padding lanes: already exhausted
    bounce_p = pad1(bounce, 1)
    flag_p = pad1(flag, 0)
    o_p = pad1(origin, 1e30)
    d_p = pad1(direction, 1.0)
    thr_p = pad1(thr, 0.0)
    srad_p = pad1(srad, 0.0)
    lrad_p = pad1(lrad, 0.0)
    so_p = pad1(shadow_o, 1e30)
    sd_p = pad1(shadow_d, 1.0)
    c_p = pad1(contrib, 0.0)
    # Clamp padding sample counters so `sample < num_frames` stays false but
    # +1 never overflows.
    sample_p = jnp.minimum(sample_p, num_frames_dyn)

    grouped, tables, start_spec, scratch = _walk_tables_and_specs(scene)
    table, starts, super_min, super_max, cl_planes = tables
    num_supers = table.shape[0]
    leaf = scene.cluster_tris.shape[1]

    pair = _PAIR and not grouped and num_supers == 1
    from .pallas_walk import _SWEEP_BUDGET, _krays, _use_prebuilt

    prebuilt = grouped and _use_prebuilt(
        num_supers, cl_planes.shape[-1], tile, _krays(grouped, rt)
    )
    # Budget-capped sweeps need the caller to route unresolved lanes
    # (sorted fused loop passes the carries); see _make_path_kernel.
    budget = (
        _SWEEP_BUDGET
        if (_SWEEP_BUDGET > 0 and grouped and not prebuilt
            and _krays(grouped, rt) == 1 and 2 <= num_supers <= 30
            and done_mask is not None)
        else 0
    )

    tiles = padded // tile
    cnt_cols = [sample_p, bounce_p, flag_p]
    pix_cols = [u_p, v_p, nb_p[:, 0], nb_p[:, 1]]
    if budget > 0:
        cnt_cols += [pad1(done_mask, 0), pad1(tri_carry, -1)]
        pix_cols += [pad1(t_carry, 1.0)]
    counters = _pack_rows(cnt_cols, tiles, tile)
    rays = _pack_rows(
        [o_p[:, 0], o_p[:, 1], o_p[:, 2], d_p[:, 0], d_p[:, 1], d_p[:, 2]],
        tiles, tile,
    )
    shade = _pack_rows(
        [thr_p[:, 0], thr_p[:, 1], thr_p[:, 2],
         srad_p[:, 0], srad_p[:, 1], srad_p[:, 2],
         lrad_p[:, 0], lrad_p[:, 1], lrad_p[:, 2]],
        tiles, tile,
    )
    pix = _pack_rows(pix_cols, tiles, tile)
    nee = _pack_rows(
        [so_p[:, 0], so_p[:, 1], so_p[:, 2],
         sd_p[:, 0], sd_p[:, 1], sd_p[:, 2],
         c_p[:, 0], c_p[:, 1], c_p[:, 2]],
        tiles, tile,
    )

    fscal = _pack_fscal(camera, sky, t_max, inv_dims)
    iscal = jnp.stack([
        jnp.asarray(frame_base, jnp.int32),
        jnp.asarray(spp_dyn, jnp.int32),
        jnp.asarray(num_frames_dyn, jnp.int32),
    ])

    def full(shape):
        zeros = tuple(0 for _ in shape)
        return pl.BlockSpec(shape, lambda i, z=zeros: z, memory_space=pltpu.VMEM)

    scratch_shapes = scratch(num_supers, tile, _krays(grouped, rt))
    if pair:
        # Stacked (closest | occlusion) entry table for the pair sweep.
        scratch_shapes = scratch_shapes + [
            pltpu.VMEM((2 * cl_planes.shape[-1], tile), jnp.float32)
        ]

    n_cnt_in = len(cnt_cols)
    n_pix = len(pix_cols)
    n_cnt_out = 4 if budget > 0 else 2
    outs = pl.pallas_call(
        _make_path_kernel(leaf, num_supers, rt, grouped=grouped, pair=pair,
                          prebuilt=prebuilt, budget=budget),
        grid=(tiles // rt,),
        in_specs=[
            pl.BlockSpec((rt, n_cnt_in, tile), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((rt, 6, tile), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((rt, 9, tile), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((rt, n_pix, tile), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((rt, 9, tile), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),  # fscal
            pl.BlockSpec(memory_space=pltpu.SMEM),  # iscal
            start_spec,  # cluster starts (SMEM scalars / grouped VMEM f32 row)
            full(super_min.shape),
            full(super_max.shape),
            full(cl_planes.shape),
            pl.BlockSpec(memory_space=pl.ANY),  # triangle table in HBM
        ],
        out_specs=[
            pl.BlockSpec((rt, n_cnt_out, tile), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((rt, 6, tile), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((rt, 9, tile), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((rt, 1, tile), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((rt, 1, tile), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((tiles, n_cnt_out, tile), jnp.int32),
            jax.ShapeDtypeStruct((tiles, 6, tile), jnp.float32),
            jax.ShapeDtypeStruct((tiles, 9, tile), jnp.float32),
            jax.ShapeDtypeStruct((tiles, 1, tile), jnp.float32),
            jax.ShapeDtypeStruct((tiles, 1, tile), jnp.int32),
        ],
        scratch_shapes=scratch_shapes,
        interpret=_interpret(),
    )(counters, rays, shade, pix, nee, fscal, iscal, starts, super_min,
      super_max, cl_planes, table)

    counters_o, rays_o, shade_o, t_o, tri_o = outs

    def unpack(block, ch):
        return block[:, ch, :].reshape(-1)[:num_rays]

    sample = unpack(counters_o, 0)
    bounce = unpack(counters_o, 1)
    origin = jnp.stack([unpack(rays_o, a) for a in range(3)], axis=1)
    direction = jnp.stack([unpack(rays_o, a) for a in range(3, 6)], axis=1)
    thr = jnp.stack([unpack(shade_o, a) for a in range(3)], axis=1)
    srad = jnp.stack([unpack(shade_o, a) for a in range(3, 6)], axis=1)
    lrad = jnp.stack([unpack(shade_o, a) for a in range(6, 9)], axis=1)
    t = unpack(t_o, 0)
    tri = unpack(tri_o, 0)
    if done_mask is None:
        return sample, bounce, origin, direction, thr, srad, lrad, t, tri
    if budget > 0:
        unres = unpack(counters_o, 2)
        done = unpack(counters_o, 3)
    else:  # carries supplied but budget disabled for this config
        unres = jnp.zeros((num_rays,), jnp.int32)
        done = jnp.zeros((num_rays,), jnp.int32)
    return (sample, bounce, origin, direction, thr, srad, lrad, t, tri,
            unres, done)


def pallas_trace_regen_segs(
    scene, camera, sky, u, v_tex, noise_base, inv_dims, frame_base, spp_dyn,
    num_frames_dyn, t_max,
    salloc, lrad, slot_cnt, slot_ray, slot_thr, slot_nee,
    tile_override=None, segs=2,
):
    """Multi-hit-segment variant of pallas_trace_regen (flat-sweep scenes
    only — see _make_path_kernel_segs). Per-slot columns (K = segs):
    slot_cnt (B, 3K) i32 [ssample, bounce, flag]; slot_ray (B, 6K)
    [o3, d3]; slot_thr (B, 6K) [thr3, srad3]; slot_nee (B, 9K)
    [sh_o3, sh_d3, contrib3]. Returns (salloc, lrad, ocnt (B, 3K)
    [ssample, bounce, tri], oray (B, 6K), othr (B, 6K), t (B, K))."""
    from .pallas_walk import _grouped_mode

    assert not _grouped_mode(scene.cluster_tris.shape[0]), (
        "segs kernel is flat-sweep only")
    num_rays = u.shape[0]
    tile, rt = tile_override or _pick_tile(scene.cluster_tris.shape[0])
    padded = -(-num_rays // (tile * rt)) * (tile * rt)
    pad = padded - num_rays

    def pad1(a, value):
        if pad == 0:
            return a
        return jnp.concatenate(
            [a, jnp.full((pad,) + a.shape[1:], value, a.dtype)])

    salloc_p = jnp.minimum(pad1(salloc, 2**30), num_frames_dyn)
    lrad_p = pad1(lrad, 0.0)
    u_p, v_p = pad1(u, 0.5), pad1(v_tex, 0.5)
    nb_p = pad1(noise_base, 0.0)
    cnt_p = pad1(slot_cnt, 0)
    # Padding lanes: every slot exhausted (ssample = nf), flags cleared.
    if pad:
        dead = jnp.concatenate([
            jnp.zeros((num_rays,), bool), jnp.ones((pad,), bool)])
        for j in range(segs):
            cnt_p = cnt_p.at[:, 3 * j].set(
                jnp.where(dead, num_frames_dyn, cnt_p[:, 3 * j]))
            cnt_p = cnt_p.at[:, 3 * j + 2].set(
                jnp.where(dead, 0, cnt_p[:, 3 * j + 2]))
    ray_p = pad1(slot_ray, 1.0)
    if pad:  # keep padded origins finite but far
        for j in range(segs):
            ray_p = ray_p.at[num_rays:, 6 * j:6 * j + 3].set(1e30)
    thr_p = pad1(slot_thr, 0.0)
    nee_p = pad1(slot_nee, 1.0)
    if pad:
        for j in range(segs):
            nee_p = nee_p.at[num_rays:, 9 * j + 6:9 * j + 9].set(0.0)

    tiles = padded // tile
    salloc_b = _pack_rows([salloc_p], tiles, tile)
    pix_b = _pack_rows([u_p, v_p, nb_p[:, 0], nb_p[:, 1]], tiles, tile)
    lrad_b = _pack_rows([lrad_p[:, a] for a in range(3)], tiles, tile)
    cnt_b = _pack_rows([cnt_p[:, c] for c in range(3 * segs)], tiles, tile)
    ray_b = _pack_rows([ray_p[:, c] for c in range(6 * segs)], tiles, tile)
    thr_b = _pack_rows([thr_p[:, c] for c in range(6 * segs)], tiles, tile)
    nee_b = _pack_rows([nee_p[:, c] for c in range(9 * segs)], tiles, tile)

    fscal = _pack_fscal(camera, sky, t_max, inv_dims)
    iscal = jnp.stack([
        jnp.asarray(frame_base, jnp.int32),
        jnp.asarray(spp_dyn, jnp.int32),
        jnp.asarray(num_frames_dyn, jnp.int32),
    ])

    grouped, tables, start_spec, scratch = _walk_tables_and_specs(scene)
    table, starts, super_min, super_max, cl_planes = tables
    num_supers = table.shape[0]
    leaf = scene.cluster_tris.shape[1]

    def full(shape):
        zeros = tuple(0 for _ in shape)
        return pl.BlockSpec(shape, lambda i, z=zeros: z,
                            memory_space=pltpu.VMEM)

    def rows(c, dtype=jnp.float32):
        return (
            pl.BlockSpec((rt, c, tile), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            jax.ShapeDtypeStruct((tiles, c, tile), dtype),
        )

    scratch_shapes = scratch(num_supers, tile, 1)
    in_specs = [
        rows(1)[0], rows(4)[0], rows(3)[0], rows(3 * segs)[0],
        rows(6 * segs)[0], rows(6 * segs)[0], rows(9 * segs)[0],
        pl.BlockSpec(memory_space=pltpu.SMEM),  # fscal
        pl.BlockSpec(memory_space=pltpu.SMEM),  # iscal
        start_spec,
        full(super_min.shape),
        full(super_max.shape),
        full(cl_planes.shape),
        pl.BlockSpec(memory_space=pl.ANY),
    ]
    out_sp = [rows(1, jnp.int32), rows(3), rows(3 * segs, jnp.int32),
              rows(6 * segs), rows(6 * segs), rows(segs)]
    outs = pl.pallas_call(
        _make_path_kernel_segs(leaf, num_supers, rt, segs),
        grid=(tiles // rt,),
        in_specs=in_specs,
        out_specs=[s for s, _ in out_sp],
        out_shape=[sh for _, sh in out_sp],
        scratch_shapes=scratch_shapes,
        interpret=_interpret(),
    )(salloc_b, pix_b, lrad_b, cnt_b, ray_b, thr_b, nee_b, fscal, iscal,
      starts, super_min, super_max, cl_planes, table)

    salloc_o, lrad_o, ocnt_o, oray_o, othr_o, t_o = outs

    def unpack(block, ch):
        return block[:, ch, :].reshape(-1)[:num_rays]

    salloc = unpack(salloc_o, 0)
    lrad = jnp.stack([unpack(lrad_o, a) for a in range(3)], axis=1)
    ocnt = jnp.stack([unpack(ocnt_o, c) for c in range(3 * segs)], axis=1)
    oray = jnp.stack([unpack(oray_o, c) for c in range(6 * segs)], axis=1)
    othr = jnp.stack([unpack(othr_o, c) for c in range(6 * segs)], axis=1)
    t = jnp.stack([unpack(t_o, j) for j in range(segs)], axis=1)
    return salloc, lrad, ocnt, oray, othr, t


def _make_shaded_path_kernel(leaf: int, num_supers: int, rt_count: int,
                             num_textures: int):
    """Persistent path kernel WITH in-kernel shading: one dispatch runs the
    whole path loop (trace + sky + NEE + texture shade + scatter + regen) for
    every lane until its samples are exhausted. See the module section
    comment above _shade_rows for the gather machinery."""

    def kernel(
        counters_ref, ray_ref, shade_ref, pix_ref, nee_ref,
        fscal, iscal, desc_ref, start_ref, super_min_ref, super_max_ref,
        cl_planes_ref, table_hbm, attr_hbm, tex_hbm,
        counters_out, ray_out, shade_out, nee_out,
        super_entry, cl_entry, tbuf, cache_tag, sem,
        attr_buf, tex_buf,
    ):
        g = pl.program_id(0)

        @pl.when(g == 0)
        def _():
            cache_tag[0] = jnp.int32(-1)
            dma = pltpu.make_async_copy(attr_hbm, attr_buf, sem)
            dma.start()
            dma.wait()
            dma2 = pltpu.make_async_copy(tex_hbm, tex_buf, sem)
            dma2.start()
            dma2.wait()

        nf = iscal[2]
        floor = iscal[4]  # per-tile live floor: exit when live <= floor
        t_max = fscal[_F_T_MAX]
        neg_inf = jnp.float32(-jnp.inf)
        one = jnp.float32(1.0)
        zero = jnp.float32(0.0)

        def per_tile(rt, _):
            sample = counters_ref[rt, 0, :]
            bounce = counters_ref[rt, 1, :]
            flag = counters_ref[rt, 2, :]
            ox, oy, oz = ray_ref[rt, 0, :], ray_ref[rt, 1, :], ray_ref[rt, 2, :]
            dx, dy, dz = ray_ref[rt, 3, :], ray_ref[rt, 4, :], ray_ref[rt, 5, :]
            t0, t1, t2 = shade_ref[rt, 0, :], shade_ref[rt, 1, :], shade_ref[rt, 2, :]
            s0, s1, s2 = shade_ref[rt, 3, :], shade_ref[rt, 4, :], shade_ref[rt, 5, :]
            l0, l1, l2 = shade_ref[rt, 6, :], shade_ref[rt, 7, :], shade_ref[rt, 8, :]
            u_row = pix_ref[rt, 0, :]
            v_row = pix_ref[rt, 1, :]
            nb0 = pix_ref[rt, 2, :]
            nb1 = pix_ref[rt, 3, :]
            sox, soy, soz = nee_ref[rt, 0, :], nee_ref[rt, 1, :], nee_ref[rt, 2, :]
            sdx, sdy, sdz = nee_ref[rt, 3, :], nee_ref[rt, 4, :], nee_ref[rt, 5, :]
            c0, c1, c2 = nee_ref[rt, 6, :], nee_ref[rt, 7, :], nee_ref[rt, 8, :]

            lanes = sample.shape[0]

            def cond(st):
                return st[-1] > 0

            def body(st):
                (sample, bounce, flag, ox, oy, oz, dx, dy, dz,
                 t0, t1, t2, s0, s1, s2, l0, l1, l2,
                 sox, soy, soz, sdx, sdy, sdz, c0, c1, c2, _) = st

                # --- resolve the previous segment's pending NEE ---
                # Unconditional: in the hybrid's shaded phases nearly every
                # round has pending NEE (each hit queues one), so a
                # pl.when guard costs a scalar sync per round for nothing;
                # with no pending lanes the sweep's selection goes +inf
                # after one slab pass and exits.
                live = sample < nf
                has_nee = live & (flag > 0)
                nonzero_c = (c0 != 0.0) | (c1 != 0.0) | (c2 != 0.0)
                pend = has_nee & nonzero_c
                shadow_bound = jnp.where(pend, t_max, neg_inf)
                six = one / sdx
                siy = one / sdy
                siz = one / sdz
                occ = _any_tile_sweep(
                    (sox, soy, soz, sdx, sdy, sdz, six, siy, siz),
                    shadow_bound,
                    start_ref, super_min_ref, super_max_ref,
                    cl_planes_ref, table_hbm, super_entry, cl_entry,
                    tbuf, cache_tag, sem, num_supers=num_supers,
                )
                vis = jnp.where(occ == 0, one, zero)
                s0 = jnp.where(has_nee, s0 + c0 * vis, s0)
                s1 = jnp.where(has_nee, s1 + c1 * vis, s1)
                s2 = jnp.where(has_nee, s2 + c2 * vis, s2)

                # --- terminate depth-limited paths, regenerate ---
                term = live & (flag == 2)
                l0 = jnp.where(term, l0 + s0, l0)
                l1 = jnp.where(term, l1 + s1, l1)
                l2 = jnp.where(term, l2 + s2, l2)
                s0 = jnp.where(term, zero, s0)
                s1 = jnp.where(term, zero, s1)
                s2 = jnp.where(term, zero, s2)
                sample = jnp.where(term, sample + 1, sample)
                regen0 = term & (sample < nf)
                nx, ny = _noise_rows(sample, nb0, nb1, iscal)
                pox, poy, poz, pdx, pdy, pdz = _primary_rows(
                    u_row, v_row, nx, ny, fscal)
                ox = jnp.where(regen0, pox, ox)
                oy = jnp.where(regen0, poy, oy)
                oz = jnp.where(regen0, poz, oz)
                dx = jnp.where(regen0, pdx, dx)
                dy = jnp.where(regen0, pdy, dy)
                dz = jnp.where(regen0, pdz, dz)
                t0 = jnp.where(regen0, one, t0)
                t1 = jnp.where(regen0, one, t1)
                t2 = jnp.where(regen0, one, t2)
                bounce = jnp.where(regen0, 1, bounce)

                # --- trace to the next surface event ---
                inflight = sample < nf
                bound0 = jnp.where(inflight, t_max, neg_inf)
                ix = one / dx
                iy = one / dy
                iz = one / dz
                bt, btri = _closest_tile_sweep(
                    (ox, oy, oz, dx, dy, dz, ix, iy, iz), bound0,
                    start_ref, super_min_ref, super_max_ref, cl_planes_ref,
                    table_hbm, super_entry, cl_entry, tbuf, cache_tag, sem,
                    num_supers=num_supers,
                )
                hit = inflight & (btri >= 0)
                miss = inflight & (btri < 0)

                # --- miss: sky, flush, regenerate ---
                skyr, skyg, skyb = _sky_rows(dx, dy, dz, fscal)
                s0 = jnp.where(miss, s0 + t0 * skyr, s0)
                s1 = jnp.where(miss, s1 + t1 * skyg, s1)
                s2 = jnp.where(miss, s2 + t2 * skyb, s2)
                l0 = jnp.where(miss, l0 + s0, l0)
                l1 = jnp.where(miss, l1 + s1, l1)
                l2 = jnp.where(miss, l2 + s2, l2)
                s0 = jnp.where(miss, zero, s0)
                s1 = jnp.where(miss, zero, s1)
                s2 = jnp.where(miss, zero, s2)
                sample = jnp.where(miss, sample + 1, sample)
                regen = miss & (sample < nf)
                nx, ny = _noise_rows(sample, nb0, nb1, iscal)
                pox, poy, poz, pdx, pdy, pdz = _primary_rows(
                    u_row, v_row, nx, ny, fscal)
                ox = jnp.where(regen, pox, ox)
                oy = jnp.where(regen, poy, oy)
                oz = jnp.where(regen, poz, oz)
                dx = jnp.where(regen, pdx, dx)
                dy = jnp.where(regen, pdy, dy)
                dz = jnp.where(regen, pdz, dz)
                t0 = jnp.where(regen, one, t0)
                t1 = jnp.where(regen, one, t1)
                t2 = jnp.where(regen, one, t2)
                bounce = jnp.where(regen, 1, bounce)

                # --- hit: in-kernel shade. Unconditional for the same
                # reason as the NEE sweep: hit rounds dominate the shaded
                # phases, and a pl.when guard plus scratch round-trip costs
                # more than the all-miss rounds it would skip. All outputs
                # are hit-masked inside _shade_rows.
                (flag, ox, oy, oz, dx, dy, dz, t0, t1, t2, bounce,
                 sox, soy, soz, sdx, sdy, sdz, c0, c1, c2) = _shade_rows(
                    hit, sample, bounce,
                    ox, oy, oz, dx, dy, dz, t0, t1, t2,
                    nb0, nb1, btri,
                    fscal, iscal, desc_ref, attr_buf, tex_buf,
                    num_textures,
                )

                cont = jnp.where(
                    jnp.sum(jnp.where(sample < nf, 1, 0)) > floor, 1, 0
                ).astype(jnp.int32)
                return (sample, bounce, flag, ox, oy, oz, dx, dy, dz,
                        t0, t1, t2, s0, s1, s2, l0, l1, l2,
                        sox, soy, soz, sdx, sdy, sdz, c0, c1, c2, cont)

            st = (sample, bounce, flag, ox, oy, oz, dx, dy, dz,
                  t0, t1, t2, s0, s1, s2, l0, l1, l2,
                  sox, soy, soz, sdx, sdy, sdz, c0, c1, c2,
                  jnp.where(
                      jnp.sum(jnp.where(sample < nf, 1, 0)) > floor, 1, 0
                  ).astype(jnp.int32))
            st = jax.lax.while_loop(cond, body, st)

            counters_out[rt, 0, :] = st[0]
            counters_out[rt, 1, :] = st[1]
            counters_out[rt, 2, :] = st[2]
            for r in range(6):
                ray_out[rt, r, :] = st[3 + r]
            for r in range(9):
                shade_out[rt, r, :] = st[9 + r]
            for r in range(9):
                nee_out[rt, r, :] = st[18 + r]
            return 0

        jax.lax.fori_loop(0, rt_count, per_tile, 0)

    return kernel


@partial(jax.jit, static_argnames=("tile_override",))
def pallas_trace_regen_shaded(
    scene, camera, sky, u, v_tex, noise_base, inv_dims, frame_base, spp_dyn,
    num_frames_dyn, num_bounces_dyn, live_floor_dyn, t_max,
    sample, bounce, flag, origin, direction, thr, srad, lrad,
    shadow_o, shadow_d, contrib,
    tile_override=None,
):
    """Run the path loop in one persistent kernel dispatch with IN-KERNEL
    shading (see _make_shaded_path_kernel). State arguments mirror
    pallas_trace_regen. Each ray tile loops until its live-lane count drops
    to live_floor_dyn (0 = every sample exhausted) — a nonzero floor lets
    the caller compact the surviving deep-tail lanes across tiles and
    re-enter, the in-kernel analog of the split loop's phased compaction.
    Returns the full lane state (sample, bounce, flag, origin, direction,
    thr, srad, lrad, shadow_o, shadow_d, contrib)."""
    num_rays = u.shape[0]
    tile, rt = tile_override or _pick_tile(scene.cluster_tris.shape[0])
    # The attribute gather lane-shuffles against (rows, 128) tables, so ray
    # tiles are fixed at 128 lanes here (the divergence-tuned default).
    assert tile == 128, "in-kernel shading runs at 128-lane ray tiles"
    padded = -(-num_rays // (tile * rt)) * (tile * rt)
    pad = padded - num_rays

    def pad1(a, value):
        if pad == 0:
            return a
        return jnp.concatenate([a, jnp.full((pad,) + a.shape[1:], value, a.dtype)])

    nf_big = jnp.int32(2**30)
    u_p = pad1(u, 0.5)
    v_p = pad1(v_tex, 0.5)
    nb_p = pad1(noise_base, 0.0)
    sample_p = pad1(sample, nf_big)
    bounce_p = pad1(bounce, 1)
    flag_p = pad1(flag, 0)
    o_p = pad1(origin, 1e30)
    d_p = pad1(direction, 1.0)
    thr_p = pad1(thr, 0.0)
    srad_p = pad1(srad, 0.0)
    lrad_p = pad1(lrad, 0.0)
    so_p = pad1(shadow_o, 1e30)
    sd_p = pad1(shadow_d, 1.0)
    c_p = pad1(contrib, 0.0)
    sample_p = jnp.minimum(sample_p, num_frames_dyn)

    tiles = padded // tile
    counters = _pack_rows([sample_p, bounce_p, flag_p], tiles, tile)
    rays = _pack_rows(
        [o_p[:, 0], o_p[:, 1], o_p[:, 2], d_p[:, 0], d_p[:, 1], d_p[:, 2]],
        tiles, tile,
    )
    shade = _pack_rows(
        [thr_p[:, 0], thr_p[:, 1], thr_p[:, 2],
         srad_p[:, 0], srad_p[:, 1], srad_p[:, 2],
         lrad_p[:, 0], lrad_p[:, 1], lrad_p[:, 2]],
        tiles, tile,
    )
    pix = _pack_rows([u_p, v_p, nb_p[:, 0], nb_p[:, 1]], tiles, tile)
    nee = _pack_rows(
        [so_p[:, 0], so_p[:, 1], so_p[:, 2],
         sd_p[:, 0], sd_p[:, 1], sd_p[:, 2],
         c_p[:, 0], c_p[:, 1], c_p[:, 2]],
        tiles, tile,
    )

    fscal = _pack_fscal(camera, sky, t_max, inv_dims)
    iscal = jnp.stack([
        jnp.asarray(frame_base, jnp.int32),
        jnp.asarray(spp_dyn, jnp.int32),
        jnp.asarray(num_frames_dyn, jnp.int32),
        jnp.asarray(num_bounces_dyn, jnp.int32),
        jnp.asarray(live_floor_dyn, jnp.int32),
    ])

    grouped, tables, start_spec, scratch = _walk_tables_and_specs(scene)
    assert not grouped, "in-kernel shading is a flat-sweep (small-scene) path"
    table, starts, super_min, super_max, cl_planes = tables
    num_supers = table.shape[0]
    leaf = scene.cluster_tris.shape[1]

    attrs, tex_planes, desc = _shade_tables(scene)
    num_textures = desc.shape[0]

    def full(shape):
        zeros = tuple(0 for _ in shape)
        return pl.BlockSpec(shape, lambda i, z=zeros: z, memory_space=pltpu.VMEM)

    scratch_shapes = scratch(num_supers, tile) + [
        pltpu.VMEM(attrs.shape, jnp.float32),
        pltpu.VMEM(tex_planes.shape, jnp.bfloat16),
    ]

    outs = pl.pallas_call(
        _make_shaded_path_kernel(leaf, num_supers, rt, num_textures),
        grid=(tiles // rt,),
        in_specs=[
            pl.BlockSpec((rt, 3, tile), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((rt, 6, tile), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((rt, 9, tile), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((rt, 4, tile), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((rt, 9, tile), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),  # fscal
            pl.BlockSpec(memory_space=pltpu.SMEM),  # iscal
            pl.BlockSpec(memory_space=pltpu.SMEM),  # texture descriptors
            start_spec,
            full(super_min.shape),
            full(super_max.shape),
            full(cl_planes.shape),
            pl.BlockSpec(memory_space=pl.ANY),  # triangle table (HBM)
            pl.BlockSpec(memory_space=pl.ANY),  # attr splits (HBM)
            pl.BlockSpec(memory_space=pl.ANY),  # texel planes (HBM)
        ],
        out_specs=[
            pl.BlockSpec((rt, 3, tile), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((rt, 6, tile), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((rt, 9, tile), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((rt, 9, tile), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((tiles, 3, tile), jnp.int32),
            jax.ShapeDtypeStruct((tiles, 6, tile), jnp.float32),
            jax.ShapeDtypeStruct((tiles, 9, tile), jnp.float32),
            jax.ShapeDtypeStruct((tiles, 9, tile), jnp.float32),
        ],
        scratch_shapes=scratch_shapes,
        interpret=_interpret(),
    )(counters, rays, shade, pix, nee, fscal, iscal, desc, starts, super_min,
      super_max, cl_planes, table, attrs, tex_planes)

    counters_o, rays_o, shade_o, nee_o = outs

    def unpack(block, ch):
        return block[:, ch, :].reshape(-1)[:num_rays]

    def unpack3(block, base):
        return jnp.stack([unpack(block, base + a) for a in range(3)], axis=1)

    return (
        unpack(counters_o, 0),            # sample
        unpack(counters_o, 1),            # bounce
        unpack(counters_o, 2),            # flag
        unpack3(rays_o, 0),               # origin
        unpack3(rays_o, 3),               # direction
        unpack3(shade_o, 0),              # thr
        unpack3(shade_o, 3),              # srad
        unpack3(shade_o, 6),              # lrad
        unpack3(nee_o, 0),                # shadow_o
        unpack3(nee_o, 3),                # shadow_d
        unpack3(nee_o, 6),                # contrib
    )
