"""On-TPU iteration-count diagnostic for the GROUPED closest sweep.

Replicates _closest_tile_sweep_grouped with two counters — super visits and
inner (cluster-test) iterations per tile-sweep — as an extra kernel output,
then drives it with realistic courtyard rays: primaries from the bench
camera, then 1st/2nd cosine-hemisphere bounces, each optionally sorted by
the previous hit triangle (what the sorted regen loop does per iteration).

This answers what the offline cluster studies could not: how much of a
tile-sweep is super-level overhead (DMA + 128-row entry build + selection
syncs per visited super) vs inner per-lane iterations. Usage:

    python prof/diag_iters.py [scale=26]
"""
import sys; sys.path.insert(0, "/root/repo")
import os
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
import numpy as np
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import rayfinder_tpu.ops.pallas_walk as pw
from rayfinder_tpu.ops.pallas_walk import (
    _slab_entry_rows, _seg_select, _gather_rows_T, _mt_block_T, _next_row,
    _fetch_super_start, _fetch_super_wait, _scene_tables_grouped,
    _prep_rays, _ray_regs, _full_spec,
    _interpret, _GROUP_K, _super_entry_fold,
)
from rayfinder_tpu.render.camera import create_camera, generate_camera_ray
from rayfinder_tpu.render.scene import build_device_scene
from rayfinder_tpu.render.sampling import sample_cosine_hemisphere
from rayfinder_tpu.scene.procedural import courtyard_scene


def _closest_sweep_counted(
    rays, bound0, super_min_ref, super_max_ref, cl_planes_ref, startf_ref,
    tableT_hbm, super_entry, cl_entry, tbufT, cache_tag, sem, num_supers,
):
    """_closest_tile_sweep_grouped + (supers_visited, inner_iters) scalars."""
    ox, oy, oz, dx, dy, dz, ix, iy, iz = rays
    tile = bound0.shape[0]
    btri0 = jnp.full((tile,), -1, jnp.int32)

    def cluster_phase(s, bt, btri, it):
        cl_entry[:, :] = _slab_entry_rows(
            cl_planes_ref[s, 0], cl_planes_ref[s, 1],
            ox, oy, oz, ix, iy, iz, bt,
        )
        group_sel = cl_planes_ref.shape[-1]
        row_io_sel = jax.lax.broadcasted_iota(jnp.int32, (group_sel, tile), 0)
        starts_rows = startf_ref[s]
        masked = jnp.where(cl_entry[:, :] < bt[None, :], cl_entry[:, :], jnp.inf)
        jb0, key0 = _seg_select(masked)

        def g_cond(st):
            return jnp.isfinite(st[3])

        def g_body(st):
            bt, btri, jb, key, it = st
            for _ in range(_GROUP_K):
                v = _gather_rows_T(tbufT, jb, range(9))
                t_cand, slot = _mt_block_T(v, ox, oy, oz, dx, dy, dz, bt)
                start_lane = jnp.take_along_axis(
                    starts_rows, jnp.broadcast_to(jb, starts_rows.shape), axis=1
                )[0]
                better = t_cand < bt
                tri = start_lane.astype(jnp.int32) + slot
                bt = jnp.where(better, t_cand, bt)
                btri = jnp.where(better, tri, btri)
                cl_entry[:, :] = jnp.where(row_io_sel == jb, jnp.inf, cl_entry[:, :])
                masked = jnp.where(
                    cl_entry[:, :] < bt[None, :], cl_entry[:, :], jnp.inf
                )
                jb, key = _seg_select(masked)
            return bt, btri, jb, key, it + 1

        bt, btri, _, _, it = jax.lax.while_loop(
            g_cond, g_body, (bt, btri, jb0, key0, it)
        )
        return bt, btri, it

    super_entry[:, :] = _super_entry_fold(
        super_min_ref, super_max_ref,
        ox, oy, oz, ix, iy, iz, bound0,
    )
    s0, k0 = _next_row(super_entry[:, :], bound0)

    def s_cond(state):
        return jnp.isfinite(state[3])

    def s_body(state):
        bt, btri, s, _, sv, it = state
        miss = _fetch_super_start(tableT_hbm, tbufT, sem, cache_tag, s)
        _fetch_super_wait(tableT_hbm, tbufT, sem, miss, s)
        bt, btri, it = cluster_phase(s, bt, btri, it)
        super_entry[s, :] = jnp.full((tile,), jnp.inf, jnp.float32)
        s_next, key = _next_row(super_entry[:, :], bt)
        return bt, btri, s_next, key, sv + 1, it

    bt, btri, _, _, sv, it = jax.lax.while_loop(
        s_cond, s_body,
        (bound0, btri0, s0, k0, jnp.int32(0), jnp.int32(0)),
    )
    return bt, btri, sv, it


def _closest_sweep_counted_prebuilt(
    rays, bound0, super_min_ref, super_max_ref, cl_planes_ref, startf_ref,
    tableT_hbm, super_agg, cl_entry, cl_all, tbufT, cache_tag, sem,
    num_supers,
):
    """_closest_tile_sweep_prebuilt + (supers_visited, inner_iters) scalars:
    exact cluster-level super selection (RAYFINDER_PREBUILT=1), counted."""
    from rayfinder_tpu.ops.pallas_walk import _prebuild_entries

    ox, oy, oz, dx, dy, dz = rays[0:6]
    tile = bound0.shape[0]
    g = cl_planes_ref.shape[-1]
    btri0 = jnp.full((tile,), -1, jnp.int32)
    row_io = jax.lax.broadcasted_iota(jnp.int32, (g, tile), 0)

    _prebuild_entries(cl_planes_ref, rays, bound0, cl_all, super_agg,
                      num_supers, super_min_ref, super_max_ref)
    s0, k0 = _next_row(super_agg[:, :], bound0)

    def s_cond(state):
        return jnp.isfinite(state[3])

    def s_body(state):
        bt, btri, s, _, sv, it = state
        miss = _fetch_super_start(tableT_hbm, tbufT, sem, cache_tag, s)
        off = pl.multiple_of(s * g, g)
        cl_entry[:, :] = cl_all[pl.ds(off, g), :]
        starts_rows = startf_ref[s]

        def select(bt):
            masked = jnp.where(cl_entry[:, :] < bt[None, :], cl_entry[:, :],
                               jnp.inf)
            return _seg_select(masked)

        jb0, key0 = select(bt)
        _fetch_super_wait(tableT_hbm, tbufT, sem, miss, s)

        def g_cond(st):
            return jnp.isfinite(st[3])

        def g_body(st):
            bt, btri, jb, key, it = st
            for _ in range(_GROUP_K):
                v = _gather_rows_T(tbufT, jb, range(9))
                t_cand, slot = _mt_block_T(v, ox, oy, oz, dx, dy, dz, bt)
                start_lane = jnp.take_along_axis(
                    starts_rows, jnp.broadcast_to(jb, starts_rows.shape),
                    axis=1,
                )[0]
                better = t_cand < bt
                tri = start_lane.astype(jnp.int32) + slot
                bt = jnp.where(better, t_cand, bt)
                btri = jnp.where(better, tri, btri)
                cl_entry[:, :] = jnp.where(row_io == jb, jnp.inf,
                                           cl_entry[:, :])
                jb, key = select(bt)
            return bt, btri, jb, key, it + 1

        bt, btri, _, _, it = jax.lax.while_loop(
            g_cond, g_body, (bt, btri, jb0, key0, it)
        )
        super_agg[s, :] = jnp.min(cl_entry[:, :], axis=0)
        s_next, key = _next_row(super_agg[:, :], bt)
        return bt, btri, s_next, key, sv + 1, it

    bt, btri, _, _, sv, it = jax.lax.while_loop(
        s_cond, s_body,
        (bound0, btri0, s0, k0, jnp.int32(0), jnp.int32(0)),
    )
    return bt, btri, sv, it


def _make_counted_kernel(leaf, num_supers, rt_count, prebuilt=False):
    def kernel(
        o_ref, d_ref, tmax_ref, start_ref, super_min_ref, super_max_ref,
        cl_planes_ref, table_hbm, t_out_ref, tri_out_ref, cnt_out_ref,
        super_entry, cl_entry, tbuf, cache_tag, sem, *cl_all,
    ):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            cache_tag[0] = jnp.int32(-1)

        def per_tile(rt, _):
            (ox, oy, oz), (dx, dy, dz), (ix, iy, iz), tmax = _ray_regs(
                o_ref, d_ref, tmax_ref, rt
            )
            if prebuilt:
                bt, btri, sv, it = _closest_sweep_counted_prebuilt(
                    (ox, oy, oz, dx, dy, dz, ix, iy, iz), tmax,
                    super_min_ref, super_max_ref, cl_planes_ref, start_ref,
                    table_hbm, super_entry, cl_entry, cl_all[0], tbuf,
                    cache_tag, sem, num_supers,
                )
            else:
                bt, btri, sv, it = _closest_sweep_counted(
                    (ox, oy, oz, dx, dy, dz, ix, iy, iz), tmax,
                    super_min_ref, super_max_ref, cl_planes_ref, start_ref,
                    table_hbm, super_entry, cl_entry, tbuf, cache_tag, sem,
                    num_supers,
                )
            t_out_ref[rt, 0, :] = bt
            tri_out_ref[rt, 0, :] = btri
            cnt_out_ref[rt, 0, :] = jnp.full((bt.shape[0],), sv, jnp.int32)
            cnt_out_ref[rt, 1, :] = jnp.full((bt.shape[0],), it, jnp.int32)
            return 0

        jax.lax.fori_loop(0, rt_count, per_tile, 0)

    return kernel


def counted_closest(scene, origin, direction, t_max, prebuilt=False):
    leaf = scene.cluster_tris.shape[1]
    num_rays = origin.shape[0]
    t_max = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (num_rays,))
    tile, rt = pw._pick_tile(scene.cluster_tris.shape[0])
    o, d, tm, tiles, n = _prep_rays(origin, direction, t_max, tile, rt)
    tableT, startf, super_min, super_max, cl_planes = _scene_tables_grouped(scene)
    num_supers = tableT.shape[0]
    cl_rows = cl_planes.shape[-1]
    scratch = [
        pltpu.VMEM((num_supers, tile), jnp.float32),
        pltpu.VMEM((cl_rows, tile), jnp.float32),
        pltpu.VMEM((9, leaf, tableT.shape[-1]), jnp.float32),
        pltpu.SMEM((1,), jnp.int32),
        pltpu.SemaphoreType.DMA(()),
    ]
    if prebuilt:
        scratch.append(
            pltpu.VMEM((num_supers * cl_rows, tile), jnp.float32))
    outs = pl.pallas_call(
        _make_counted_kernel(leaf, num_supers, rt, prebuilt),
        grid=(tiles // rt,),
        in_specs=[
            pl.BlockSpec((rt, 3, tile), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((rt, 3, tile), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((rt, 1, tile), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            _full_spec(startf.shape),
            _full_spec(super_min.shape),
            _full_spec(super_max.shape),
            _full_spec(cl_planes.shape),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec((rt, 1, tile), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((rt, 1, tile), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((rt, 2, tile), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((tiles, 1, tile), jnp.float32),
            jax.ShapeDtypeStruct((tiles, 1, tile), jnp.int32),
            jax.ShapeDtypeStruct((tiles, 2, tile), jnp.int32),
        ],
        scratch_shapes=scratch,
        interpret=_interpret(),
    )(o, d, tm, startf, super_min, super_max, cl_planes, tableT)
    t_out, tri_out, cnt = outs
    tri = tri_out.reshape(-1)[:n]
    hit = tri >= 0
    t = jnp.where(hit, t_out.reshape(-1)[:n], t_max[:n])
    sv = cnt[:, 0, 0]  # per tile-sweep
    it = cnt[:, 1, 0]
    return hit, t, tri, sv, it


def cosine_bounce(scene, on, dn, hitn, tn, trin, rng):
    """One cosine-hemisphere bounce off the hit surfaces (numpy, offline):
    returns (origins, directions, parent_tri) for the hit subset."""
    sp = np.asarray(scene.tri_positions)
    trin = np.maximum(trin, 0)
    p = on + tn[:, None] * dn
    v0, v1, v2 = sp[trin, 0], sp[trin, 1], sp[trin, 2]
    gn = np.cross(v1 - v0, v2 - v0)
    gn /= np.maximum(np.linalg.norm(gn, axis=1, keepdims=True), 1e-12)
    gn = np.where((np.einsum("ij,ij->i", gn, dn) > 0)[:, None], -gn, gn)
    noise = rng.random((len(on), 2)).astype(np.float32)
    wi = np.asarray(sample_cosine_hemisphere(jnp.asarray(noise),
                                             jnp.asarray(gn)))
    return (p + 1e-3 * gn)[hitn], wi[hitn], trin[hitn]


def dir_key_order(scene, dn, trih):
    """Production dir-key ordering (pathtracer._dir_bin_key replica):
    parent hit cluster x 96 world-frame direction bins — the lane order the
    RAYFINDER_SORT_KEY=dir fused loop feeds its kernel."""
    tri_map = np.asarray(scene.cluster_tri_map)
    C_ = np.asarray(scene.cluster_min).shape[0]
    L_ = tri_map.shape[0] // C_
    t2c = np.zeros(int(tri_map.max()) + 2, np.int64)
    vmask = tri_map >= 0
    t2c[tri_map[vmask]] = np.arange(C_ * L_)[vmask] // L_
    hc = t2c[trih]
    dd = dn
    ad = np.abs(dd)
    is_x = (ad[:, 0] >= ad[:, 1]) & (ad[:, 0] >= ad[:, 2])
    is_y = ~is_x & (ad[:, 1] >= ad[:, 2])
    m = np.maximum(ad.max(1), 1e-20)
    ds2 = np.where(is_x, dd[:, 0], np.where(is_y, dd[:, 1], dd[:, 2]))
    face = np.where(is_x, 0, np.where(is_y, 2, 4)) + (ds2 > 0)
    u2 = np.where(is_x, dd[:, 1], np.where(is_y, dd[:, 2], dd[:, 0]))
    v2 = np.where(is_x, dd[:, 2], np.where(is_y, dd[:, 0], dd[:, 1]))
    ub = np.clip(((u2 / m + 1.0) * 2.0).astype(np.int64), 0, 3)
    vb = np.clip(((v2 / m + 1.0) * 2.0).astype(np.int64), 0, 3)
    ck = hc * 96 + (face * 4 + ub) * 4 + vb
    return np.argsort(ck, kind="stable")


def main():
    scale = int(sys.argv[1]) if len(sys.argv) > 1 else 26
    prebuilt = os.environ.get("RAYFINDER_DIAG_PREBUILT", "0") == "1"
    W = H = 512
    flat, textures = courtyard_scene(scale)
    scene = build_device_scene(flat, textures=textures)
    C = scene.cluster_tris.shape[0]
    print(f"tris {flat.positions.shape[0]} clusters {C} "
          f"supers {-(-C // pw.SUPER_G)} prebuilt {prebuilt}")
    camera = create_camera([-16.0, 5.0, 0.0], [12.0, 2.0, 0.0], 0.0, 1.0,
                           70.0, W / H)
    js, is_ = np.meshgrid(np.arange(W), np.arange(H), indexing="xy")
    u = (js.reshape(-1) + 0.5).astype(np.float32) / W
    v = 1.0 - (is_.reshape(-1) + 0.5).astype(np.float32) / H
    o, d = generate_camera_ray(camera, jnp.asarray(u), jnp.asarray(v))

    rng = np.random.default_rng(7)

    def report(tag, o, d):
        hit, t, tri, sv, it = jax.block_until_ready(
            counted_closest(scene, o, d, jnp.float32(1e4), prebuilt=prebuilt))
        # fence via host fetch
        svn, itn = np.asarray(sv), np.asarray(it)
        print(f"{tag:>14}: rays {o.shape[0]:7d} hit {float(jnp.mean(hit)):.2f} "
              f"supers/tile mean {svn.mean():6.2f} p95 "
              f"{np.percentile(svn, 95):6.1f} "
              f"inner/tile mean {itn.mean():6.2f} p95 "
              f"{np.percentile(itn, 95):6.1f} "
              f"inner/super {itn.sum() / max(svn.sum(), 1):5.2f}")
        return hit, t, tri

    hit, t, tri = report("primary", o, d)
    on, dn = np.asarray(o), np.asarray(d)
    for bounce in (1, 2):
        on, dn, trih = cosine_bounce(
            scene, on, dn, np.asarray(hit), np.asarray(t),
            np.asarray(tri), rng)
        report(f"bounce{bounce} raw", jnp.asarray(on), jnp.asarray(dn))
        order = np.argsort(trih, kind="stable")
        os_, ds_ = on[order], dn[order]
        hit, t, tri = report(f"bounce{bounce} srt", jnp.asarray(os_),
                             jnp.asarray(ds_))
        orderc = dir_key_order(scene, dn, trih)
        report(f"bounce{bounce} dir", jnp.asarray(on[orderc]),
               jnp.asarray(dn[orderc]))
        on, dn = os_, ds_


if __name__ == "__main__":
    main()
