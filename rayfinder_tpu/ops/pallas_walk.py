"""Pallas TPU kernels for two-level cluster-sweep ray traversal.

The XLA wavefront walk (render/wavefront.py) is HBM-bound: every walk step
gathers (chunk, L, 3, 3) triangle blocks out to HBM and reads them back. These
kernels reorganize traversal around the TPU's strengths:

* triangles are grouped into clusters of L consecutive leaf-ordered
  triangles, and clusters into super-clusters of SUPER consecutive clusters
  (both spatially coherent: the SAH builder's depth-first leaf order is a
  space-filling walk);
* the Pallas grid is 1D over groups of RT ray tiles; the triangle table stays
  in HBM (`pl.ANY`) and each tile DMAs in ONLY the supers it needs,
  nearest-first: per tile, a front-to-back while_loop over supers (selected
  by per-lane slab entry distance against the current best hit) wraps an
  inner front-to-back while_loop over the super's clusters. This is the
  block-uniform analog of the reference's near-child-first stack traversal
  (ray_intersection.cpp:138-213) at two granularities, and it never spends
  HBM bandwidth on pruned supers;
* a one-slot VMEM table cache skips the DMA when consecutive tiles want the
  same super (always true on single-super scenes);
* surviving clusters run dense (TILE, L) Möller-Trumbore with numerics
  identical to render/intersect.py (EPSILON 1e-5, reference:
  src/pt/reference_path_tracer.wgsl:477-521).

Mosaic constraints shape the code: leading-dimension dynamic indexing only,
int32 loop carries (i1 vectors fail scf.for legalization), and numpy (not
jnp) module constants so nothing is captured as a traced value. Correctness
is pinned against the XLA walk in tests/test_pallas_walk.py.
"""

from __future__ import annotations

import os

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

EPSILON = np.float32(1e-5)  # numpy: a jnp scalar would be captured as a constant
# Tunables (env-overridable for config scans; defaults are the tuned values).
SUPER = int(os.environ.get("RAYFINDER_SUPER", "64"))  # clusters per super-cluster
# Rays per tile. A/B on the Duck bench (v5e, 2026-08-17): 128 benches 33.4
# Mrays/s vs 31.7 at 512 and 21.2 at 64 — smaller tiles shrink the per-tile
# cluster union (bounce-ray divergence) faster than the per-iteration sync
# cost grows, until 64 where sync dominates.
TILE = int(os.environ.get("RAYFINDER_TILE", "128"))
# Ray tiles processed per grid step: amortizes the ~4us fixed cost of a
# Mosaic grid step (measured on v5e: a no-op kernel at 469 steps costs ~2ms).
RT = int(os.environ.get("RAYFINDER_RT", "32"))
# Big scenes prune better with finer tiles (the tile-union of overlapped
# clusters shrinks faster than the per-test cost grows). 128/32 A/B'd best
# on BOTH scales (Duck 33.4 vs 31.7; 254K-tri courtyard 1.29 vs 0.86
# Mrays/s vs the old 256/16) — kept as a separate knob for big-scene
# retuning. Scene shapes are static under jit, so the pick happens at
# trace time. Env TILE/RT force both paths.
_BIG_TILE = int(os.environ.get("RAYFINDER_BIG_TILE", "128"))
_BIG_RT = int(os.environ.get("RAYFINDER_BIG_RT", "32"))
from ..bvh.clusters import BIG_CLUSTERS as _BIG_CLUSTERS


def _pick_tile(num_clusters: int) -> tuple[int, int]:
    if "RAYFINDER_TILE" in os.environ or "RAYFINDER_RT" in os.environ:
        return TILE, RT
    if num_clusters > _BIG_CLUSTERS:
        return _BIG_TILE, _BIG_RT
    return TILE, RT
_FAR = np.float32(1e30)  # padded-cluster AABB plane: slab test always misses


def _slab_entry_rows(mins, maxs, ox, oy, oz, ix, iy, iz, tmax):
    """(rows, TILE) entry distances; +inf where the slab test fails.

    mins/maxs: (3, rows). Mirrors render/wavefront._slab_entry (and
    ray_intersection.cpp:101-136) exactly, including NaN comparison semantics
    for axis-parallel rays.
    """

    def axis_ts(lo, hi, o, inv):
        neg = inv < 0.0
        near_b = jnp.where(neg[None, :], hi[:, None], lo[:, None])
        far_b = jnp.where(neg[None, :], lo[:, None], hi[:, None])
        t0 = (near_b - o[None, :]) * inv[None, :]
        t1 = (far_b - o[None, :]) * inv[None, :]
        return t0, t1

    t0x, t1x = axis_ts(mins[0, :], maxs[0, :], ox, ix)
    t0y, t1y = axis_ts(mins[1, :], maxs[1, :], oy, iy)
    t0z, t1z = axis_ts(mins[2, :], maxs[2, :], oz, iz)

    tmin_xy = jnp.maximum(t0x, t0y)
    tmax_xy = jnp.minimum(t1x, t1y)
    fail_xy = (t0x > t1y) | (t0y > t1x)
    fail_z = (tmin_xy > t1z) | (t0z > tmax_xy)
    tmin = jnp.maximum(tmin_xy, t0z)
    tmax_box = jnp.minimum(tmax_xy, t1z)

    hit = ~fail_xy & ~fail_z & (tmin < tmax[None, :]) & (tmax_box > 0.0)
    return jnp.where(hit, jnp.maximum(tmin, 0.0), jnp.inf)


def _mt_block(tbuf, j, ox, oy, oz, dx, dy, dz, t_bound):
    """Möller-Trumbore of TILE rays vs cluster j's (L,) vertex rows.

    tbuf: (9, SUPER, L) VMEM table — rows v0x v0y v0z v1x v1y v1z v2x v2y
    v2z. (Rows lead so the DMA'd minor dims are the aligned (SUPER, L)
    tiles; a (SUPER, 9, L) slice has a 9-sublane second-minor dim, and
    DMAing that faults the TPU worker.) Returns (t, slot): per-ray min-t
    over the block (inf when no accept) and its lane index.
    """
    v = [tbuf[r, j][None, :] for r in range(9)]
    v0x, v0y, v0z = v[0], v[1], v[2]
    e1x = v[3] - v0x
    e1y = v[4] - v0y
    e1z = v[5] - v0z
    e2x = v[6] - v0x
    e2y = v[7] - v0y
    e2z = v[8] - v0z

    dxc, dyc, dzc = dx[:, None], dy[:, None], dz[:, None]
    hx = dyc * e2z - dzc * e2y
    hy = dzc * e2x - dxc * e2z
    hz = dxc * e2y - dyc * e2x
    det = e1x * hx + e1y * hy + e1z * hz
    inv_det = jnp.float32(1.0) / det

    sx = ox[:, None] - v0x
    sy = oy[:, None] - v0y
    sz = oz[:, None] - v0z
    u = inv_det * (sx * hx + sy * hy + sz * hz)
    qx = sy * e1z - sz * e1y
    qy = sz * e1x - sx * e1z
    qz = sx * e1y - sy * e1x
    vv = inv_det * (dxc * qx + dyc * qy + dzc * qz)
    t = inv_det * (e2x * qx + e2y * qy + e2z * qz)

    ok = (
        (jnp.abs(det) >= EPSILON)
        & (u >= 0.0) & (u <= 1.0)
        & (vv >= 0.0) & (u + vv <= 1.0)
        & (t > EPSILON) & (t < t_bound[:, None])
    )
    t_masked = jnp.where(ok, t, jnp.inf)
    slot = jnp.argmin(t_masked, axis=1)
    t_best = jnp.min(t_masked, axis=1)
    return t_best, slot.astype(jnp.int32)


def _ray_regs(o_ref, d_ref, tmax_ref, rt: int):
    ox, oy, oz = o_ref[rt, 0, :], o_ref[rt, 1, :], o_ref[rt, 2, :]
    dx, dy, dz = d_ref[rt, 0, :], d_ref[rt, 1, :], d_ref[rt, 2, :]
    tmax = tmax_ref[rt, 0, :]
    inv = (jnp.float32(1.0) / dx, jnp.float32(1.0) / dy, jnp.float32(1.0) / dz)
    return (ox, oy, oz), (dx, dy, dz), inv, tmax


def _next_row(entry, bt):
    """Front-to-back selection over a (rows, TILE) entry table.

    Returns (j, key): the untested row whose nearest needing lane is closest
    (the block-uniform analog of the reference's near-child-first stack
    order, ray_intersection.cpp:170-189), and that nearest distance.
    key == +inf means no row has any lane with entry < bound — the
    whole-tile early-exit condition. Used at both granularities: rows are
    super-clusters in the outer loop and clusters in the inner loop.
    """
    masked = jnp.where(entry < bt[None, :], entry, jnp.inf)
    key = jnp.min(masked, axis=1, keepdims=True)  # (rows, 1)
    j = jnp.argmin(key, axis=0)[0].astype(jnp.int32)
    return j, jnp.min(key)


# ---------------------------------------------------------------------------
# GROUPED (sub-tile) cluster sweeps — big-scene traversal.
#
# Enclosed scenes are MT-bound through block-uniform divergence: a 128-lane
# tile of bounce rays sweeps the UNION of clusters its lanes need (measured
# 52 on the courtyard where each ray needs 2.1; even oracle ordering leaves
# ~30). The grouped sweep selects one cluster per 8-LANE RAY GROUP each
# iteration instead of one per tile, cutting the lockstep iteration count to
# the max over 16 groups (measured 13.6 on the courtyard) at the SAME
# per-iteration cost (probe: 5.39us vs 5.30us per tile-iteration):
#
#  * per-group front-to-back selection runs entirely vectorized — per-lane
#    argmin over the (clusters, TILE) entry table, then a segmented (8-lane)
#    argmin via masked lane rolls; ONE scalar sync per iteration, as before;
#  * each group's cluster rows are fetched with a tpu.dynamic_gather LANE
#    SHUFFLE of the TRANSPOSED table (9, L, G): per-lane triangle data
#    (L, TILE) with no scalar extraction and no dynamic indexing on the hot
#    loads. (Originally an f32 one-hot MXU matmul-gather — WRONG on real
#    TPU, where f32 matmuls decompose into bf16 passes; see _gather_rows_T.)
#  * the Möller-Trumbore block runs with TRIS ON SUBLANES, rays staying on
#    lanes: (L, TILE) ops, the same VPU volume as the flat (TILE, L) block.
#
# A group whose lanes are all bounded selects row 0 spuriously; testing it is
# harmless (any true intersection below the bound is a valid accept; slab
# pruning is only an optimization) and its lanes' erases touch only rows it
# no longer needs. Cluster starts ride as an f32 row lane-shuffled like the
# vertices (exact for leaf-order indices < 2^24 in f32).
# ---------------------------------------------------------------------------

# Clusters per super in the grouped layout: 128 keeps the transposed table's
# minor dims (L, SUPER_G) an aligned (128, 128) tile for the DMA and makes
# the matmul-gather a full (L, S) x (S, TILE) MXU op. Imported from
# bvh/clusters.py so the scene-level SA-bounded super padding
# (super_pad_clusters) and this DMA layout can never disagree.
from ..bvh.clusters import SUPER_GROUP as SUPER_G
# Rays per selection group. 1 = fully per-lane front-to-back (no segmented
# fold at all: every lane sweeps exactly the clusters IT needs, iterations =
# max over lanes); 8 = one cluster per sublane-width group. TPU A/B
# (courtyard, v5e, 2026-08-17): 1 -> 2.81 Mrays/s, 4 -> 2.31, 8 -> 2.02 —
# per-lane selection wins big (same per-iteration cost, far fewer
# iterations), so 1 is the default.
_SUB = int(os.environ.get("RAYFINDER_SUB", "1"))
# Per-lane clusters tested per grouped while-iteration (like _SWEEP_K for
# the flat sweeps). TPU A/B (courtyard, 2026-08-17, post-shuffle-gather):
# K=2 benches 3.02 vs 3.20 Mrays/s at K=1 — the wasted trailing test round
# (gather + MT + selection pass) outweighs the saved sync, the same
# balance the pair sweep measured. Default 1.
_GROUP_K = int(os.environ.get("RAYFINDER_GROUP_K", "1"))
# Rays per lane in the grouped sweeps (K-aggregation): each lane owns KRAYS
# rays from KRAYS consecutive ray tiles and serves whichever still has work
# in the visited super, so the lockstep iteration count tracks the MEAN
# per-lane workload instead of the per-tile MAX, and KRAYS tiles share each
# super visit's DMA + entry build. Offline sim on TPU-dumped courtyard(26)
# bounce rays (prof/sim_ksweep.py, validated against on-TPU counters):
# K=4 contiguous cuts inner iterations 16.7 -> 7.9/tile and super visits
# 11.8 -> 3.7/tile. BUT the round-2 judge bisected the TPU bench at HEAD
# defaults: KRAYS=4 = 3.175 Mrays/s vs KRAYS=1 = 3.453 — the predicted
# iteration cut does not survive the per-iteration cost of serving K
# tables, so the default is 1 until an aggregated path actually beats it
# on TPU (re-bench any default flip TWICE per repo discipline).
KRAYS = int(os.environ.get("RAYFINDER_KRAYS", "1"))
# Monotone-act selection for K-aggregated sweeps (RAYFINDER_ACTSEL=0 reverts
# to the K-table merge). The K=4 aggregation benched NEUTRAL (3.44 vs 3.45
# Mrays/s) because _act_and_select's per-iteration cost scales with K: K
# masked-table builds, K min-reduces, a (K-1)-where merge, K key reduces and
# K conditional erases — ~21 (G, TILE) table ops/iteration vs ~6 at K=1,
# eating the 53% iteration cut. This path keeps ONE (G, TILE) ACTIVE entry
# table per lane plus a forward-only per-lane table pointer (bounds only
# shrink and erases only remove entries, so a drained table stays drained —
# serving each lane's rays strictly in order is exactly what
# _act_and_select's first-finite rule already did): ~9 table ops/iteration
# independent of K.
_ACTSEL = os.environ.get("RAYFINDER_ACTSEL", "1") == "1"
# Prebuilt cluster-entry tables (kr == 1 grouped sweeps): build the slab
# entries for ALL clusters once per tile sweep into a (S*G, TILE) VMEM
# table, aggregate each super's exact per-lane minimum, and drive the
# super-level front-to-back selection from those CLUSTER-level minima
# instead of the fat super-AABB union. Round-2 diagnostics
# (prof/diag_iters.py): bounce tiles visited 16-19 of 24 supers (7.1
# visits for 2.9 productive cluster iterations) because the super union
# box accepts rays that overlap NO actual cluster — each spurious visit
# paying a 590KB DMA + a 128-row entry build + selection syncs. With
# exact aggregation a super is visited only if some lane still needs one
# of ITS clusters under the current bound, and the visit reuses the
# prebuilt rows (sliced into the entry scratch) instead of rebuilding.
# VMEM cost: S*G*TILE*4 bytes (1.5MB on the 2951-cluster courtyard);
# capped below, falling back to the per-visit path.
# TPU A/B (courtyard, v5e, 2026-08-19): the first prebuilt cut benched
# 1.605 Mrays/s vs 3.465 for the per-visit path — probe_prebuilt.py
# bisected the loss to the per-super min-aggregation FUSED into the build
# loop (+33us/sweep: 24 sublane reduces of live register values; the
# build itself is ~3us and the dynamic slice copy free). Default OFF
# until an aggregation-free variant beats the sub-box refinement below.
_PREBUILT = os.environ.get("RAYFINDER_PREBUILT", "0") == "1"
# Sub-box super selection (grouped sweeps): the super-level slab test uses
# K sub-AABBs of G/K consecutive leaf-order clusters each instead of the
# single G-cluster union box, folded with an ELEMENTWISE min across K
# separate (S, TILE) entry builds — no sublane reduces, no extra VMEM
# tables, and the per-visit flow is unchanged. Round-2 diagnostics: bounce
# tiles visited 16-19 of 24 supers for ~3 productive ones. MEASURED
# (v5e, 2026-08-19, courtyard diag_iters + bench): sub-boxes at K=8 cut
# visits only 7.1 -> 5.9 on primaries and ~19 -> ~18.6 on bounce tiles —
# the visits are caused by BLOCK-UNIFORM DIVERGENCE (128 bounce lanes
# genuinely overlap most supers' clusters), not by union-box looseness —
# and the K extra builds cost ~1us/sweep: bench 3.295 vs 3.465 Mrays/s.
# Default 1 (single union box); the knob stays for tighter-geometry
# scenes where divergence is lower.
_SUBBOX = int(os.environ.get("RAYFINDER_SUBBOX", "1"))
_PREBUILT_MAX_BYTES = int(
    os.environ.get("RAYFINDER_PREBUILT_MAX_BYTES", str(6 * 1024 * 1024))
)
# Pipelined super selection in the grouped sweeps: select the NEXT super
# (and the loop-exit key) from the bounds at VISIT START, before the
# cluster phase runs, so the vector->scalar index extraction resolves
# under the sweep instead of serializing after it (the per-visit analog
# of _PIPE_SEL). Stale bounds are a superset: the loop can pay one extra
# no-op visit (build + select-exit, and possibly one spurious super DMA)
# per tile, but never skips a needed super. Exactness unchanged (accepts
# are bound-guarded at test time).
_PIPE_SUPER = os.environ.get("RAYFINDER_PIPE_SUPER", "0") == "1"
# Sync-free prefix rounds for the grouped cluster phases (the grouped
# analog of _SWEEP_PREFIX): run P gather+MT rounds unconditionally before
# the while_loop, so the per-visit scalar key extraction (vector->scalar
# sync, ~1-2us) resolves UNDER the first round's MT work instead of
# gating it. Exact: every tested (lane, row) pair is bound-guarded, a
# lane with no needed row tests row 0 under its own bound (accepts are
# real intersections; erasing a tested row is safe because bounds only
# shrink — the _next_rows2 argument). Average visits do 1.1-1.4 inner
# rounds (diag_iters), so P=1 wastes almost nothing.
_GPREFIX = int(os.environ.get("RAYFINDER_GPREFIX", "0"))
# Budget-capped grouped closest sweeps (big sorted scenes, kr == 1,
# 2..30 supers): at most B super visits per sweep call; lanes with
# remaining enterable supers return unresolved with a (t, tri,
# done-bitmask) carry and are re-sorted into coherent tiles for the next
# dispatch, instead of serializing their original tile-mates (diag: tile
# rounds mean 10.7 / p95 21 vs per-lane need ~0.5 on bounce
# populations — the per-tile MAX is the dominant measured waste).
_SWEEP_BUDGET = int(os.environ.get("RAYFINDER_SWEEP_BUDGET", "0"))


def _use_prebuilt(num_supers: int, group: int, tile: int, kr: int) -> bool:
    return (
        _PREBUILT
        and kr == 1
        and num_supers > 1
        and num_supers * group * tile * 4 <= _PREBUILT_MAX_BYTES
    )


def _grouped_mode(num_clusters: int) -> bool:
    mode = os.environ.get("RAYFINDER_GROUPED", "auto")
    if mode == "auto":
        # TPU A/B (v5e, 2026-08-17): courtyard 2.81 (_SUB=1) vs 1.84 flat
        # Mrays/s (+53%)
        # with the sorted regen accumulator; small scenes keep the flat
        # sweeps (single-super fast path already sync-lean there).
        return num_clusters > _BIG_CLUSTERS
    return mode == "1"


def _seg_select(masked):
    """Per-8-lane-group front-to-back selection over a (rows, TILE) masked
    entry table (+inf = not needed). Returns (jb, key): (1, TILE) int32 —
    each lane's selected row, uniform within its group (row 0 where the
    group has nothing) — and the global scalar min (early-exit when inf).
    """
    tile = masked.shape[1]
    m = jnp.min(masked, axis=0, keepdims=True)  # (1, TILE)
    a = jnp.argmin(masked, axis=0).astype(jnp.int32)[None, :]
    if _SUB == 1:
        # Fully per-lane selection: the per-lane argmin IS the answer.
        jb = jnp.where(jnp.isfinite(m), a, 0)
        return jb, jnp.min(m)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, tile), 1)
    seg = lane % _SUB
    folds = [k for k in (1, 2, 4, 8, 16, 32, 64) if k < _SUB]
    # Suffix fold: each group's lane 0 ends holding the group (min, argmin).
    for k in folds:
        m2 = pltpu.roll(m, tile - k, 1)
        a2 = pltpu.roll(a, tile - k, 1)
        ok = (seg + k < _SUB) & (m2 < m)
        m = jnp.where(ok, m2, m)
        a = jnp.where(ok, a2, a)
    # Prefix broadcast: spread each group-lane-0's row id across its group.
    jb = jnp.where(seg == 0, a, jnp.int32(2**30))
    for k in folds:
        jb = jnp.where(seg >= k, jnp.minimum(jb, pltpu.roll(jb, k, 1)), jb)
    jb = jnp.where(jb == jnp.int32(2**30), 0, jb)
    return jb, jnp.min(m)


def _gather_lanes(mat, jb):
    """Per-lane lane-shuffle gather: mat (R, G) by jb (1, TILE) -> (R, TILE).

    G == TILE is one tpu.dynamic_gather. G == banks*TILE (SUPER_G > 128)
    shuffles each 128-lane bank with jb % TILE and selects by jb's bank id —
    the lane shuffle itself only reaches within one 128-lane register."""
    r, g = mat.shape
    tile = jb.shape[1]
    if g == tile:
        return jnp.take_along_axis(mat, jnp.broadcast_to(jb, (r, tile)), axis=1)
    assert g % tile == 0, "table lane dim must be a TILE multiple"
    idx = jnp.broadcast_to(jb % tile, (r, tile))
    bank = jb // tile  # (1, TILE)
    out = None
    for b in range(g // tile):
        v = jnp.take_along_axis(mat[:, b * tile:(b + 1) * tile], idx, axis=1)
        out = v if out is None else jnp.where(bank == b, v, out)
    return out


def _gather_rows_T(tbufT, jb, rows):
    """Per-lane row fetch: tpu.dynamic_gather lane shuffle of the transposed
    table (R, L, G) by each lane's selected cluster jb (1, TILE) -> per-lane
    rows [(L, TILE)].

    This REPLACED an f32 one-hot MXU matmul-gather: Mosaic decomposes f32
    matmuls into bf16 passes, so the "gather" silently rounded its values —
    measured on v5e (777-cluster scene, 4096 rays): only 2.9% of hits
    returned the right triangle index (cluster starts ~73K need 17+ bits;
    vertex f32s need 24). The lane shuffle is exact and drops the one-hot
    build plus ten MXU passes per selection round. G > 128 uses banked
    shuffles (_gather_lanes)."""
    return [_gather_lanes(tbufT[r], jb) for r in rows]


def _mt_block_T(v, ox, oy, oz, dx, dy, dz, t_bound):
    """Möller-Trumbore with tris on SUBLANES: v = 9 (L, TILE) vertex-row
    matrices (per-lane cluster data), rays broadcast over sublanes. Returns
    (t_best, slot): per-LANE min-t over the L tris (inf when none) and its
    sublane index."""
    v0x, v0y, v0z = v[0], v[1], v[2]
    e1x = v[3] - v0x
    e1y = v[4] - v0y
    e1z = v[5] - v0z
    e2x = v[6] - v0x
    e2y = v[7] - v0y
    e2z = v[8] - v0z

    dxc, dyc, dzc = dx[None, :], dy[None, :], dz[None, :]
    hx = dyc * e2z - dzc * e2y
    hy = dzc * e2x - dxc * e2z
    hz = dxc * e2y - dyc * e2x
    det = e1x * hx + e1y * hy + e1z * hz
    inv_det = jnp.float32(1.0) / det

    sx = ox[None, :] - v0x
    sy = oy[None, :] - v0y
    sz = oz[None, :] - v0z
    u = inv_det * (sx * hx + sy * hy + sz * hz)
    qx = sy * e1z - sz * e1y
    qy = sz * e1x - sx * e1z
    qz = sx * e1y - sy * e1x
    vv = inv_det * (dxc * qx + dyc * qy + dzc * qz)
    t = inv_det * (e2x * qx + e2y * qy + e2z * qz)

    ok = (
        (jnp.abs(det) >= EPSILON)
        & (u >= 0.0) & (u <= 1.0)
        & (vv >= 0.0) & (u + vv <= 1.0)
        & (t > EPSILON) & (t < t_bound[None, :])
    )
    t_masked = jnp.where(ok, t, jnp.inf)
    slot = jnp.argmin(t_masked, axis=0)
    t_best = jnp.min(t_masked, axis=0)
    return t_best, slot.astype(jnp.int32)


def _sel_k(act, vals):
    """Per-lane select over K (TILE,) vectors by act (TILE,) int32."""
    out = vals[0]
    for k in range(1, len(vals)):
        out = jnp.where(act == k, vals[k], out)
    return out


def _act_and_select(masked_k):
    """K-aggregated per-lane selection: each lane serves its FIRST ray set
    with remaining work. masked_k: list of (rows, TILE) entry tables (+inf =
    not needed under that ray's bound). Returns (jb, act, key): the per-lane
    selected row (1, TILE), the per-lane active ray set (TILE,) int32, and
    the global min (exit when +inf: every lane's every ray is drained)."""
    if len(masked_k) == 1:
        jb, key = _seg_select(masked_k[0])
        return jb, jnp.zeros((masked_k[0].shape[1],), jnp.int32), key
    tile = masked_k[0].shape[1]
    act = jnp.full((tile,), len(masked_k) - 1, jnp.int32)
    for k in reversed(range(len(masked_k) - 1)):
        has = jnp.isfinite(jnp.min(masked_k[k], axis=0))
        act = jnp.where(has, jnp.int32(k), act)
    m_act = masked_k[-1]
    for k in reversed(range(len(masked_k) - 1)):
        m_act = jnp.where((act == k)[None, :], masked_k[k], m_act)
    jb, key = _seg_select(m_act)
    # key must stay finite while ANY set has work (a lane's later sets hide
    # behind its first); take the min across all tables, not just actives.
    for m in masked_k:
        key = jnp.minimum(key, jnp.min(m))
    return jb, act, key


def _advance_tab(act, has_k):
    """Smallest table index > act with build-time work (has_k bits from the
    super-visit entry build); act itself when none remains. act = -1 yields
    each lane's FIRST table with work."""
    nxt = act
    for k in range(len(has_k) - 1, -1, -1):
        nxt = jnp.where(has_k[k] & (k > act), jnp.int32(k), nxt)
    return nxt


def _load_tab(cl_entries, act):
    """Per-lane column select over the K entry tables: lane i's column comes
    from cl_entries[act[i]]. (K-1) table wheres."""
    out = cl_entries[0][:, :]
    for k in range(1, len(cl_entries)):
        out = jnp.where((act == k)[None, :], cl_entries[k][:, :], out)
    return out


def _act_select(cur_entry, cl_entries, act, bounds_k, has_k):
    """Monotone-act per-lane selection over the single ACTIVE entry table.

    Each lane sweeps its K rays' cluster tables strictly in order. A lane
    whose active table drains under its CURRENT bound advances one table per
    selection round, skipping tables that were already empty at build time
    (has_k); a table that was live at build but drained since (its ray's
    bound shrank) costs one spurious round to step past. Termination: act
    strictly increases on advance and is bounded by K-1.

    Writes advanced lanes' fresh columns into cur_entry. Returns
    (jb, act, key) with the _act_and_select contract: key stays finite while
    any lane has work left in ANY of its tables (pending advances count)."""
    bound = _sel_k(act, bounds_k)
    masked = jnp.where(cur_entry[:, :] < bound[None, :], cur_entry[:, :],
                       jnp.inf)
    m = jnp.min(masked, axis=0)
    # Liveness folds the CURRENT bound into the build-time has_k bits: a
    # table whose ray has drained since build (bound collapsed to -inf,
    # e.g. occluded in the any-sweep) is skipped outright instead of
    # costing one spurious gather+MT round per dead table.
    live_k = [h & (b > jnp.float32(-jnp.inf))
              for h, b in zip(has_k, bounds_k)]
    nxt = _advance_tab(act, live_k)
    can_adv = ~jnp.isfinite(m) & (nxt > act)
    act2 = jnp.where(can_adv, nxt, act)
    cur2 = jnp.where(can_adv[None, :], _load_tab(cl_entries, act2),
                     cur_entry[:, :])
    cur_entry[:, :] = cur2
    bound2 = _sel_k(act2, bounds_k)
    masked2 = jnp.where(
        can_adv[None, :],
        jnp.where(cur2 < bound2[None, :], cur2, jnp.inf),
        masked,
    )
    jb, key = _seg_select(masked2)
    # A lane may still hold work behind a stale-drained table: keep the loop
    # alive while any lane can advance further (live tables only).
    m2 = jnp.min(masked2, axis=0)
    pend = ~jnp.isfinite(m2) & (_advance_tab(act2, live_k) > act2)
    key = jnp.minimum(
        key, jnp.min(jnp.where(pend, jnp.float32(0.0), jnp.inf))
    )
    return jb, act2, key


def _next_row_k(super_entries, bounds_k):
    """Tile-uniform front-to-back super selection over K ray sets: the
    nearest needing (lane, set) pair picks the super."""
    m = None
    for se, bt in zip(super_entries, bounds_k):
        mk = jnp.where(se[:, :] < bt[None, :], se[:, :], jnp.inf)
        m = mk if m is None else jnp.minimum(m, mk)
    key = jnp.min(m, axis=1, keepdims=True)
    j = jnp.argmin(key, axis=0)[0].astype(jnp.int32)
    return j, jnp.min(key)


_PREBUILD_CHUNK = int(os.environ.get("RAYFINDER_PREBUILD_CHUNK", "8"))


def _prebuild_entries(cl_planes_ref, rays, bound0, cl_all, super_agg,
                      num_supers: int, super_min_ref, super_max_ref):
    """Build every cluster's slab entry for one tile, writing the (S*G,
    TILE) table and each super's exact per-lane minimum (S, TILE). All
    values >= 0, +inf where the slab test fails under bound0; masking by
    the CURRENT (shrinking) bound at selection time is equivalent to
    rebuilding with it, because the slab entry does not depend on the
    bound below the pass/fail cut and min-then-mask == mask-then-min for a
    per-lane bound.

    The build is CHUNKED: a fori_loop over chunks of _PREBUILD_CHUNK
    supers with a static unroll inside. A full static unroll let Mosaic
    software-pipeline all S iterations, keeping every super's (G, TILE)
    entry block live across the per-super min reduces (+33us per sweep,
    probe_prebuilt session 9); a fully serialized per-super fori pays loop
    overhead S times. The chunk restores intra-chunk pipelining while
    bounding liveness to _PREBUILD_CHUNK blocks. Each chunk is gated on
    its cheap union-box entries (super_agg is pre-seeded with the fat
    fold): a super whose union box no lane enters under bound0 contains no
    enterable cluster, its agg rows are already +inf, and its (never-read)
    cl_all block stays stale. Fully dead / all-miss tiles skip the whole
    loop."""
    ox, oy, oz, _, _, _, ix, iy, iz = rays
    g = cl_planes_ref.shape[-1]
    fat = _super_entry_fold(
        super_min_ref, super_max_ref, ox, oy, oz, ix, iy, iz, bound0,
    )
    super_agg[:, :] = fat

    def build_one(s, off):
        e = _slab_entry_rows(
            cl_planes_ref[s, 0], cl_planes_ref[s, 1],
            ox, oy, oz, ix, iy, iz, bound0,
        )
        cl_all[pl.ds(off, g), :] = e
        return jnp.min(e, axis=0)

    chunk = _PREBUILD_CHUNK if num_supers % _PREBUILD_CHUNK == 0 else 1

    def body(c, _):
        abase = pl.multiple_of(c * chunk, chunk)

        @pl.when(jnp.isfinite(jnp.min(super_agg[pl.ds(abase, chunk), :])))
        def _():
            mins = []
            for k in range(chunk):
                s = abase + k
                off = pl.multiple_of(c * (chunk * g), chunk * g) + k * g
                mins.append(build_one(s, off))
            if chunk == 1:
                super_agg[abase, :] = mins[0]
            else:
                super_agg[pl.ds(abase, chunk), :] = jnp.stack(mins, axis=0)

        return 0

    @pl.when(jnp.isfinite(jnp.min(fat)))
    def _():
        jax.lax.fori_loop(0, num_supers // chunk, body, 0)


def _closest_tile_sweep_prebuilt(
    rays, bound0, cl_planes_ref, startf_ref, tableT_hbm,
    super_agg, cl_entry, cl_all, tbufT, cache_tag, sem, num_supers: int,
    super_min_ref=None, super_max_ref=None,
):
    """kr == 1 grouped closest sweep over prebuilt entry tables: exact
    cluster-level super selection (see _PREBUILT), per-lane front-to-back
    within each visited super. Semantically identical to
    _closest_tile_sweep_grouped at K == 1 — same accepts, same gathers —
    minus the spurious super visits and per-visit entry rebuilds."""
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
        bt, btri, s, _ = state
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
            return jnp.isfinite(st[-1])

        def g_body(st):
            bt, btri, jb, key = st
            for _ in range(_GROUP_K):
                v = _gather_rows_T(tbufT, jb, range(9))
                t_cand, slot = _mt_block_T(v, ox, oy, oz, dx, dy, dz, bt)
                start_lane = _gather_lanes(starts_rows, jb)[0]
                tri = start_lane.astype(jnp.int32) + slot
                better = t_cand < bt
                bt = jnp.where(better, t_cand, bt)
                btri = jnp.where(better, tri, btri)
                cl_entry[:, :] = jnp.where(row_io == jb, jnp.inf,
                                           cl_entry[:, :])
                jb, key = select(bt)
            return bt, btri, jb, key

        bt, btri, _, _ = jax.lax.while_loop(g_cond, g_body,
                                            (bt, btri, jb0, key0))
        # Erases live in the sliced copy; fold them back into the exact
        # per-super minimum (rows not under the exit bound stay finite but
        # can never be re-selected: the bound only shrinks).
        super_agg[s, :] = jnp.min(cl_entry[:, :], axis=0)
        s_next, key = _next_row(super_agg[:, :], bt)
        return bt, btri, s_next, key

    bt, btri, _, _ = jax.lax.while_loop(
        s_cond, s_body, (bound0, btri0, s0, k0)
    )
    return bt, btri


def _any_tile_sweep_prebuilt(
    rays, tmax, cl_planes_ref, tableT_hbm,
    super_agg, cl_entry, cl_all, tbufT, cache_tag, sem, num_supers: int,
    super_min_ref=None, super_max_ref=None,
):
    """kr == 1 grouped occlusion sweep over prebuilt entry tables (the
    any-hit analog of _closest_tile_sweep_prebuilt). Returns occ int32."""
    ox, oy, oz, dx, dy, dz = rays[0:6]
    tile = tmax.shape[0]
    g = cl_planes_ref.shape[-1]
    row_io = jax.lax.broadcasted_iota(jnp.int32, (g, tile), 0)

    def pending(occ):
        return jnp.where(occ == 0, tmax, -jnp.inf)

    occ0 = jnp.zeros((tile,), jnp.int32)
    _prebuild_entries(cl_planes_ref, rays, tmax, cl_all, super_agg,
                      num_supers, super_min_ref, super_max_ref)
    s0, k0 = _next_row(super_agg[:, :], pending(occ0))

    def s_cond(state):
        return jnp.isfinite(state[2])

    def s_body(state):
        occ, s, _ = state
        miss = _fetch_super_start(tableT_hbm, tbufT, sem, cache_tag, s)
        off = pl.multiple_of(s * g, g)
        cl_entry[:, :] = cl_all[pl.ds(off, g), :]

        def select(occ):
            bound = pending(occ)
            masked = jnp.where(cl_entry[:, :] < bound[None, :],
                               cl_entry[:, :], jnp.inf)
            return _seg_select(masked)

        jb0, key0 = select(occ)
        _fetch_super_wait(tableT_hbm, tbufT, sem, miss, s)

        def g_cond(st):
            return jnp.isfinite(st[-1])

        def g_body(st):
            occ, jb, key = st
            for _ in range(_GROUP_K):
                v = _gather_rows_T(tbufT, jb, range(9))
                t_cand, _ = _mt_block_T(v, ox, oy, oz, dx, dy, dz,
                                        pending(occ))
                occ = jnp.where(jnp.isfinite(t_cand), jnp.int32(1), occ)
                cl_entry[:, :] = jnp.where(row_io == jb, jnp.inf,
                                           cl_entry[:, :])
                jb, key = select(occ)
            return occ, jb, key

        occ, _, _ = jax.lax.while_loop(g_cond, g_body, (occ, jb0, key0))
        super_agg[s, :] = jnp.min(cl_entry[:, :], axis=0)
        s_next, key = _next_row(super_agg[:, :], pending(occ))
        return occ, s_next, key

    occ, _, _ = jax.lax.while_loop(s_cond, s_body, (occ0, s0, k0))
    return occ


def _super_entry_fold(super_min_ref, super_max_ref,
                      ox, oy, oz, ix, iy, iz, bound):
    """(S, TILE) super entry table from the K sub-box plane sets (K, 3, S):
    elementwise min over K slab-entry builds (_SUBBOX). Conservative: a
    cluster is contained in its sub-box, so a super whose every sub-box
    misses under the bound contains no cluster the ray can need. Entries
    are >= the union-box entry (tighter boxes are entered later), and inf
    for the spurious supers the union box used to admit."""
    k = super_min_ref.shape[0]
    e = None
    for j in range(k):
        ej = _slab_entry_rows(
            super_min_ref[j], super_max_ref[j],
            ox, oy, oz, ix, iy, iz, bound,
        )
        e = ej if e is None else jnp.minimum(e, ej)
    return e


def _closest_tile_sweep_grouped(
    rays_k, bound0_k, super_min_ref, super_max_ref, cl_planes_ref, startf_ref,
    tableT_hbm, super_entries, cl_entries, tbufT, cache_tag, sem,
    num_supers: int, cur_entry=None,
    budget: int = 0, btri0_k=None, done_mask=None,
):
    """Grouped closest sweep over K ray sets sharing one lane tile:
    tile-uniform front-to-back over supers (as in _closest_tile_sweep),
    PER-LANE front-to-back over each super's clusters, with each lane
    serving whichever of its K rays still has work in the resident super
    (K-aggregation: iterations track the mean per-lane workload instead of
    the per-tile max, and K tiles share each super visit's DMA + entry
    build — see KRAYS). startf_ref: (S, 8, SUPER_G) f32, row 0 = global
    leaf-order cluster starts. rays_k/bound0_k/super_entries/cl_entries:
    length-K lists. Returns (bts, btris) lists."""
    K = len(rays_k)
    tile = bound0_k[0].shape[0]
    if btri0_k is None:
        btri0_k = [jnp.full((tile,), -1, jnp.int32) for _ in range(K)]
    oxs = [r[0] for r in rays_k]
    oys = [r[1] for r in rays_k]
    ozs = [r[2] for r in rays_k]
    dxs = [r[3] for r in rays_k]
    dys = [r[4] for r in rays_k]
    dzs = [r[5] for r in rays_k]

    use_act = K > 1 and _ACTSEL and cur_entry is not None
    def cluster_phase(s, bts, btris, finish=None):
        for k in range(K):
            cl_entries[k][:, :] = _slab_entry_rows(
                cl_planes_ref[s, 0], cl_planes_ref[s, 1],
                oxs[k], oys[k], ozs[k],
                rays_k[k][6], rays_k[k][7], rays_k[k][8], bts[k],
            )
        # Selection runs over the (possibly shrunk) entry rows; the gather
        # spans the 128-aligned DMA'd table lanes (jb always < group_sel).
        group_sel = cl_planes_ref.shape[-1]
        row_io_sel = jax.lax.broadcasted_iota(jnp.int32, (group_sel, tile), 0)
        # (8, G_dma): Mosaic's dynamic_gather lowering rejects sublane dim 1,
        # so shuffle the full 8-row padded block and read row 0.
        starts_rows = startf_ref[s]

        if use_act:
            has_k = [
                jnp.isfinite(jnp.min(cl_entries[k][:, :], axis=0))
                for k in range(K)
            ]
            act_start = jnp.maximum(
                _advance_tab(jnp.full((tile,), -1, jnp.int32), has_k), 0
            )
            cur_entry[:, :] = _load_tab(cl_entries, act_start)

            def select(bts, act):
                return _act_select(cur_entry, cl_entries, act, bts, has_k)

            def erase(jb, act):
                cur_entry[:, :] = jnp.where(
                    row_io_sel == jb, jnp.inf, cur_entry[:, :]
                )
        else:
            act_start = jnp.zeros((tile,), jnp.int32)

            def select(bts, act):
                masked_k = [
                    jnp.where(
                        cl_entries[k][:, :] < bts[k][None, :],
                        cl_entries[k][:, :], jnp.inf,
                    )
                    for k in range(K)
                ]
                return _act_and_select(masked_k)

            def erase(jb, act):
                for k in range(K):
                    cl_entries[k][:, :] = jnp.where(
                        (row_io_sel == jb) & (act == k)[None, :],
                        jnp.inf, cl_entries[k][:, :],
                    )

        jb0, act0, key0 = select(bts, act_start)
        if finish is not None:
            finish()  # the builds/selection above never read tbufT

        def g_cond(st):
            return jnp.isfinite(st[-1])

        def g_body(st):
            bts = list(st[0:K])
            btris = list(st[K:2 * K])
            jb, act, key = st[2 * K], st[2 * K + 1], st[2 * K + 2]
            for _ in range(_GROUP_K):
                v = _gather_rows_T(tbufT, jb, range(9))
                ox = _sel_k(act, oxs)
                oy = _sel_k(act, oys)
                oz = _sel_k(act, ozs)
                dx = _sel_k(act, dxs)
                dy = _sel_k(act, dys)
                dz = _sel_k(act, dzs)
                bound = _sel_k(act, bts)
                t_cand, slot = _mt_block_T(v, ox, oy, oz, dx, dy, dz, bound)
                start_lane = _gather_lanes(starts_rows, jb)[0]
                tri = start_lane.astype(jnp.int32) + slot
                for k in range(K):
                    better = (act == k) & (t_cand < bts[k])
                    bts[k] = jnp.where(better, t_cand, bts[k])
                    btris[k] = jnp.where(better, tri, btris[k])
                erase(jb, act)
                jb, act, key = select(bts, act)
            return (*bts, *btris, jb, act, key)

        st = (*bts, *btris, jb0, act0, key0)
        for _ in range(_GPREFIX):
            st = g_body(st)
        st = jax.lax.while_loop(g_cond, g_body, st)
        return list(st[0:K]), list(st[K:2 * K])

    if num_supers == 1:
        s1 = jnp.int32(0)
        miss1 = _fetch_super_start(tableT_hbm, tbufT, sem, cache_tag, s1)
        return cluster_phase(
            0, list(bound0_k), btri0_k,
            finish=lambda: _fetch_super_wait(tableT_hbm, tbufT, sem, miss1, s1),
        )

    use_budget = budget > 0 and K == 1 and done_mask is not None
    for k in range(K):
        fold = _super_entry_fold(
            super_min_ref, super_max_ref,
            oxs[k], oys[k], ozs[k],
            rays_k[k][6], rays_k[k][7], rays_k[k][8], bound0_k[k],
        )
        if use_budget and k == 0:
            # Per-lane resume: mask out supers this lane already completed
            # in an earlier (budget-capped) dispatch. done_mask is a
            # per-lane int32 bitmask (num_supers <= 30 enforced by the
            # caller); progress is monotone — each dispatch completes at
            # least one super per needing lane — so segments terminate.
            row_s = jax.lax.broadcasted_iota(
                jnp.int32, (num_supers, tile), 0)
            bit = jnp.bitwise_and(
                jax.lax.shift_right_logical(done_mask[None, :], row_s),
                jnp.int32(1))
            fold = jnp.where(bit == 1, jnp.inf, fold)
        super_entries[k][:, :] = fold
    s0, k0 = _next_row_k(super_entries, bound0_k)

    if use_budget:
        # Budget-capped variant (RAYFINDER_SWEEP_BUDGET): at most `budget`
        # super visits per call; lanes with remaining enterable supers
        # return unres=1 plus their (bt, btri, done_mask) carry, to be
        # re-sorted and resumed by a later dispatch at full occupancy.
        inf_row = jnp.full((tile,), jnp.inf, jnp.float32)

        def sb_cond(state):
            return jnp.isfinite(state[3]) & (state[5] < jnp.int32(budget))

        def sb_body(state):
            bt, btri, s, _, done, cnt = state
            miss = _fetch_super_start(tableT_hbm, tbufT, sem, cache_tag, s)
            bts, btris = cluster_phase(
                s, [bt], [btri],
                finish=lambda: _fetch_super_wait(
                    tableT_hbm, tbufT, sem, miss, s),
            )
            super_entries[0][s, :] = inf_row
            done = jnp.bitwise_or(done, jnp.left_shift(jnp.int32(1), s))
            s_next, key = _next_row_k(super_entries, bts)
            return (bts[0], btris[0], s_next, key, done, cnt + 1)

        bt, btri, _, _, done, _ = jax.lax.while_loop(
            sb_cond, sb_body,
            (bound0_k[0], btri0_k[0], s0, k0, done_mask, jnp.int32(0)),
        )
        rem = jnp.where(super_entries[0][:, :] < bt[None, :],
                        super_entries[0][:, :], jnp.inf)
        unres = jnp.isfinite(jnp.min(rem, axis=0)).astype(jnp.int32)
        return [bt], [btri], done, unres

    def s_cond(state):
        return jnp.isfinite(state[-1])

    def s_body(state):
        bts = list(state[0:K])
        btris = list(state[K:2 * K])
        s = state[2 * K]
        miss = _fetch_super_start(tableT_hbm, tbufT, sem, cache_tag, s)
        if _PIPE_SUPER:
            # Erase s, then select the next super against the PRE-sweep
            # bounds: the scalar extraction rides under the cluster phase.
            inf_row = jnp.full((tile,), jnp.inf, jnp.float32)
            for k in range(K):
                super_entries[k][s, :] = inf_row
            s_next, key = _next_row_k(super_entries, bts)
            bts, btris = cluster_phase(
                s, bts, btris,
                finish=lambda: _fetch_super_wait(
                    tableT_hbm, tbufT, sem, miss, s),
            )
            return (*bts, *btris, s_next, key)
        bts, btris = cluster_phase(
            s, bts, btris,
            finish=lambda: _fetch_super_wait(tableT_hbm, tbufT, sem, miss, s),
        )
        inf_row = jnp.full((tile,), jnp.inf, jnp.float32)
        for k in range(K):
            super_entries[k][s, :] = inf_row
        s_next, key = _next_row_k(super_entries, bts)
        return (*bts, *btris, s_next, key)

    state = jax.lax.while_loop(
        s_cond, s_body, (*bound0_k, *btri0_k, s0, k0)
    )
    return list(state[0:K]), list(state[K:2 * K])


def _any_tile_sweep_grouped(
    rays_k, tmax_k, super_min_ref, super_max_ref, cl_planes_ref,
    tableT_hbm, super_entries, cl_entries, tbufT, cache_tag, sem,
    num_supers: int, cur_entry=None,
):
    """Grouped occlusion sweep over K ray sets (no slot/start bookkeeping;
    lanes drop a ray to a -inf bound the moment it occludes). Returns a
    length-K list of occ (TILE,) int32."""
    K = len(rays_k)
    tile = tmax_k[0].shape[0]
    oxs = [r[0] for r in rays_k]
    oys = [r[1] for r in rays_k]
    ozs = [r[2] for r in rays_k]
    dxs = [r[3] for r in rays_k]
    dys = [r[4] for r in rays_k]
    dzs = [r[5] for r in rays_k]

    def pending_bound(occ, k):
        return jnp.where(occ == 0, tmax_k[k], -jnp.inf)

    occ0_k = [jnp.zeros((tile,), jnp.int32) for _ in range(K)]

    use_act = K > 1 and _ACTSEL and cur_entry is not None
    def cluster_phase(s, occs, finish=None):
        for k in range(K):
            cl_entries[k][:, :] = _slab_entry_rows(
                cl_planes_ref[s, 0], cl_planes_ref[s, 1],
                oxs[k], oys[k], ozs[k],
                rays_k[k][6], rays_k[k][7], rays_k[k][8],
                pending_bound(occs[k], k),
            )
        group_sel = cl_planes_ref.shape[-1]
        row_io_sel = jax.lax.broadcasted_iota(jnp.int32, (group_sel, tile), 0)

        if use_act:
            has_k = [
                jnp.isfinite(jnp.min(cl_entries[k][:, :], axis=0))
                for k in range(K)
            ]
            act_start = jnp.maximum(
                _advance_tab(jnp.full((tile,), -1, jnp.int32), has_k), 0
            )
            cur_entry[:, :] = _load_tab(cl_entries, act_start)

            def select(occs, act):
                bounds_k = [pending_bound(occs[k], k) for k in range(K)]
                return _act_select(cur_entry, cl_entries, act, bounds_k,
                                   has_k)

            def erase(jb, act):
                cur_entry[:, :] = jnp.where(
                    row_io_sel == jb, jnp.inf, cur_entry[:, :]
                )
        else:
            act_start = jnp.zeros((tile,), jnp.int32)

            def select(occs, act):
                masked_k = [
                    jnp.where(
                        cl_entries[k][:, :]
                        < pending_bound(occs[k], k)[None, :],
                        cl_entries[k][:, :], jnp.inf,
                    )
                    for k in range(K)
                ]
                return _act_and_select(masked_k)

            def erase(jb, act):
                for k in range(K):
                    cl_entries[k][:, :] = jnp.where(
                        (row_io_sel == jb) & (act == k)[None, :],
                        jnp.inf, cl_entries[k][:, :],
                    )

        jb0, act0, key0 = select(occs, act_start)
        if finish is not None:
            finish()  # the builds/selection above never read tbufT

        def g_cond(st):
            return jnp.isfinite(st[-1])

        def g_body(st):
            occs = list(st[0:K])
            jb, act, key = st[K], st[K + 1], st[K + 2]
            for _ in range(_GROUP_K):
                v = _gather_rows_T(tbufT, jb, range(9))
                ox = _sel_k(act, oxs)
                oy = _sel_k(act, oys)
                oz = _sel_k(act, ozs)
                dx = _sel_k(act, dxs)
                dy = _sel_k(act, dys)
                dz = _sel_k(act, dzs)
                bound = _sel_k(act, [pending_bound(occs[k], k) for k in range(K)])
                t_cand, _ = _mt_block_T(v, ox, oy, oz, dx, dy, dz, bound)
                hit = jnp.isfinite(t_cand)
                for k in range(K):
                    occs[k] = jnp.where(
                        (act == k) & hit, jnp.int32(1), occs[k]
                    )
                erase(jb, act)
                jb, act, key = select(occs, act)
            return (*occs, jb, act, key)

        st = (*occs, jb0, act0, key0)
        for _ in range(_GPREFIX):
            st = g_body(st)
        st = jax.lax.while_loop(g_cond, g_body, st)
        return list(st[0:K])

    if num_supers == 1:
        s1 = jnp.int32(0)
        miss1 = _fetch_super_start(tableT_hbm, tbufT, sem, cache_tag, s1)
        return cluster_phase(
            0, occ0_k,
            finish=lambda: _fetch_super_wait(tableT_hbm, tbufT, sem, miss1, s1),
        )

    for k in range(K):
        super_entries[k][:, :] = _super_entry_fold(
            super_min_ref, super_max_ref,
            oxs[k], oys[k], ozs[k],
            rays_k[k][6], rays_k[k][7], rays_k[k][8], tmax_k[k],
        )
    s0, k0 = _next_row_k(
        super_entries, [pending_bound(occ0_k[k], k) for k in range(K)]
    )

    def s_cond(state):
        return jnp.isfinite(state[-1])

    def s_body(state):
        occs = list(state[0:K])
        s = state[K]
        miss = _fetch_super_start(tableT_hbm, tbufT, sem, cache_tag, s)
        if _PIPE_SUPER:
            inf_row = jnp.full((tile,), jnp.inf, jnp.float32)
            for k in range(K):
                super_entries[k][s, :] = inf_row
            s_next, key = _next_row_k(
                super_entries, [pending_bound(occs[k], k) for k in range(K)]
            )
            occs = cluster_phase(
                s, occs,
                finish=lambda: _fetch_super_wait(
                    tableT_hbm, tbufT, sem, miss, s),
            )
            return (*occs, s_next, key)
        occs = cluster_phase(
            s, occs,
            finish=lambda: _fetch_super_wait(tableT_hbm, tbufT, sem, miss, s),
        )
        inf_row = jnp.full((tile,), jnp.inf, jnp.float32)
        for k in range(K):
            super_entries[k][s, :] = inf_row
        s_next, key = _next_row_k(
            super_entries, [pending_bound(occs[k], k) for k in range(K)]
        )
        return (*occs, s_next, key)

    state = jax.lax.while_loop(s_cond, s_body, (*occ0_k, s0, k0))
    return list(state[0:K])


def _scene_tables_grouped(scene):
    """Grouped-layout scene tables: transposed triangle table
    (S, 9, L, G) — a super's DMA slice has aligned (L, G) minor tiles and
    feeds the matmul-gather directly — plus an f32 cluster-start row padded
    to (S, 8, G), super planes (3, S), and cluster planes (S, 2, 3, G).

    The DMA'd table/starts lane dim must stay 128-aligned (Mosaic tiling),
    but a SINGLE-super scene shrinks the SELECTION structures (cl_planes,
    and with them the per-round slab entry + argmin passes) to the cluster
    count rounded to a sublane multiple of 8: padding a 33-cluster scene's
    entry table to 128 rows tripled the per-round selection cost for
    nothing (the pad rows are degenerate)."""
    num_clusters, leaf = scene.cluster_tris.shape[:2]
    if num_clusters <= SUPER_G:
        num_supers, group_sel = 1, max(8, -(-num_clusters // 8) * 8)
    else:
        num_supers, group_sel = -(-num_clusters // SUPER_G), SUPER_G
    group = SUPER_G if num_supers > 1 else max(128, -(-group_sel // 128) * 128)
    pad = num_supers * group - num_clusters

    table = scene.cluster_tris.reshape(num_clusters, leaf, 9).transpose(0, 2, 1)
    cl_min = scene.cluster_min
    cl_max = scene.cluster_max
    starts = scene.cluster_start
    if pad:
        table = jnp.concatenate(
            [table, jnp.zeros((pad, 9, leaf), jnp.float32)], axis=0
        )
        cl_min = jnp.concatenate([cl_min, jnp.full((pad, 3), _FAR)], axis=0)
        cl_max = jnp.concatenate([cl_max, jnp.full((pad, 3), _FAR)], axis=0)
        starts = jnp.concatenate([starts, jnp.zeros((pad,), jnp.int32)])

    # (S, G, 9, L) -> (S, 9, L, G): vertex rows lead, cluster id rides the
    # lane dim for the onehot contraction.
    tableT = table.reshape(num_supers, group, 9, leaf).transpose(0, 2, 3, 1)
    groups_min = cl_min.reshape(num_supers, group, 3)
    groups_max = cl_max.reshape(num_supers, group, 3)
    # Sub-box super planes (K, 3, S): K sub-AABBs of group/K consecutive
    # leaf-order clusters per super; the kernel folds K slab-entry tables
    # with an elementwise min (see _SUBBOX). K == 1 degenerates to the
    # plain union box.
    #
    # Pad clusters are (1e30)^3 POINT boxes (super_pad_clusters): their
    # cluster-level slab rows correctly never pass, but a plain min/max
    # union here would blow every padded super's MAX corner out to 1e30 —
    # turning the super box into a half-open box that contains nearly
    # every ray origin (entry 0, no far-plane pruning, scrambled
    # front-to-back order). Exclude pads from the union (+inf/-inf
    # identities); an all-pad sub-box becomes (+inf, -inf) and can never
    # pass the slab test.
    k = max(1, min(_SUBBOX, group)) if num_supers > 1 else 1
    while group % k:
        k -= 1
    sub = group // k
    pad_mask = cl_min[:, 0:1] >= _FAR
    min_src = jnp.where(pad_mask, jnp.float32(jnp.inf), cl_min)
    max_src = jnp.where(pad_mask, jnp.float32(-jnp.inf), cl_max)
    sub_min = min_src.reshape(num_supers, k, sub, 3)
    sub_max = max_src.reshape(num_supers, k, sub, 3)
    super_min = jnp.min(sub_min, axis=2).transpose(1, 2, 0)  # (K, 3, S)
    super_max = jnp.max(sub_max, axis=2).transpose(1, 2, 0)
    cl_planes = jnp.stack(
        [groups_min.transpose(0, 2, 1), groups_max.transpose(0, 2, 1)], axis=1
    )[:, :, :, :group_sel]
    startf = jnp.zeros((num_supers, 8, group), jnp.float32)
    startf = startf.at[:, 0, :].set(
        starts.reshape(num_supers, group).astype(jnp.float32)
    )
    return tableT, startf, super_min, super_max, cl_planes


# Clusters tested per sweep while-iteration: each iteration pays one
# scalar/vector sync (loop condition + selection argmins), which costs as
# much as a Möller-Trumbore block — wider K amortizes it at the price of up
# to K-1 wasted (all-lanes-masked) MT blocks on the final iteration.
_SWEEP_K = int(os.environ.get("RAYFINDER_SWEEP_K", "2"))
# Tile-level skip guards for the single-super fast paths: a sky-pointing or
# fully-parked tile currently pays the whole (rows, TILE) cluster entry
# build plus the first selection sync just to discover it has nothing to
# test. The closest sweep pre-rejects against the ROOT (single-super) AABB
# — one 1-row slab test + a scalar any — and the occlusion sweep guards on
# any pending bound. Measured motivation: an all-dead 49152-lane Duck
# dispatch costs 1.45 ms (~3.7us/tile of pure build+sync floor), and the
# full-width sky phase (0.194 s of the 64spp bench run) is ~90% sky tiles.
_ROOT_SKIP = os.environ.get("RAYFINDER_ROOT_SKIP", "0") == "1"
# Pipelined row selection in _cluster_sweep (see its docstring). TPU A/B
# (v5e, 2026-08-19, two runs each): Duck 51.04/51.42 Mrays/s vs 49.06/49.94
# at 0 (+3%); courtyard unchanged (grouped sweeps don't use _cluster_sweep).
_PIPE_SEL = os.environ.get("RAYFINDER_PIPE_SEL", "1") == "1"
# Sync-free selection PREFIX in _cluster_sweep: select the P front-to-back
# nearest rows in one wave — P (min, erase-ties-by-VALUE) vector passes
# whose P scalar argmin extracts have no serial dependency on each other —
# then test all P rows unrolled (each Möller-Trumbore stays bound-guarded
# at test time), then run the normal while loop for whatever remains. A
# typical compacted-phase Duck tile needs ~7.5 cluster tests but pays a
# 1-2us vector->scalar sync per while iteration; the prefix replaces the
# first ceil(P/K) iterations' serial syncs with one overlapped wave, at
# the price of up to P wasted (fully-guarded) MT blocks on tiles that
# needed fewer rows. Exact: selection order is unchanged, erase-by-value
# may skip tied rows in the prefix but they stay in the entry table for
# the mop-up loop. TPU A/B (v5e, 2026-08-20, Duck, base 53.24 Mrays/s):
# P=2 57.36/57.04/57.86 (+7.6%, default), P=3 56.51, P=1 56.23,
# P=4 54.80/55.02, P=8 48.92; courtyard P=2 3.502 vs 3.495 (neutral —
# grouped sweeps don't use _cluster_sweep, only the tail phases do).
_SWEEP_PREFIX = int(os.environ.get("RAYFINDER_SWEEP_PREFIX", "2"))


def _next_rowsk(entry, bt, k: int):
    """Front-to-back selection of the K nearest needed rows.

    Returns ([j0..j(k-1)], key0): the K untested rows ordered by their
    closest needing lane, and the nearest such distance. key0 == +inf is
    the early-exit condition; trailing rows may point at exhausted rows
    (their per-lane `need` masks are then all false, so testing them is
    merely wasted compute on the final iteration).
    """
    masked = jnp.where(entry < bt[None, :], entry, jnp.inf)
    key = jnp.min(masked, axis=1, keepdims=True)  # (rows, 1)
    row_ids = jax.lax.broadcasted_iota(jnp.int32, key.shape, 0)
    js = []
    for _ in range(k):
        j = jnp.argmin(key, axis=0)[0].astype(jnp.int32)
        js.append(j)
        key = jnp.where(row_ids == j, jnp.inf, key)
    return js, jnp.min(masked)


def _fetch_super_start(table_hbm, tbuf, sem, cache_tag, s):
    """Issue the one-slot-cached DMA for super s WITHOUT waiting; returns the
    miss predicate for _fetch_super_wait. Every sweep's per-visit flow does
    entry builds and a selection round that never read tbuf — splitting the
    wait lets the copy ride under that work instead of serializing in front
    of it (per-visit DMA+build+syncs were measured at ~4us on courtyard
    bounce tiles, prof/diag_iters.py). Unlike the reverted two-slot prefetch
    pipeline there is ONE buffer and no dynamic slot index on the hot MT
    loads — semantics and layout are unchanged, only the wait moves."""
    if os.environ.get("RAYFINDER_DMA_DEBUG") == "uncond":
        dma = pltpu.make_async_copy(table_hbm.at[s], tbuf, sem)
        dma.start()
        dma.wait()
        return None
    miss = cache_tag[0] != s

    @pl.when(miss)
    def _():
        pltpu.make_async_copy(table_hbm.at[s], tbuf, sem).start()
        cache_tag[0] = s

    return miss


def _fetch_super_wait(table_hbm, tbuf, sem, miss, s):
    """Complete a _fetch_super_start: consume the DMA semaphore iff a copy
    was issued (miss). Must run exactly once per start, BEFORE any tbuf read
    and before the next start on the same buffer."""
    if miss is None:
        return

    @pl.when(miss)
    def _():
        pltpu.make_async_copy(table_hbm.at[s], tbuf, sem).wait()


def _cluster_sweep(tbuf, cl_entry, test_one, bound0, carry0):
    """Inner front-to-back sweep over one super's clusters, _SWEEP_K per
    iteration.

    test_one(j, erow, carry) -> (carry, bound): dense-test cluster j (erow =
    its hoisted entry row), fold into the carry, return the updated selection
    bound. Terminates when no cluster has a lane with entry < bound. Erasing
    every selected row is safe even when a trailing one was already
    exhausted: the bound only shrinks during a sweep, so a row with no lane
    under the current bound can never be needed again.

    RAYFINDER_PIPE_SEL=1 pipelines the selection: each iteration erases the
    carried rows, selects the NEXT rows against the PRE-test bound, and only
    then runs the Möller-Trumbore tests — so the vector->scalar row-index
    extraction (the ~2-4us/iteration sync that dominates small-scene sweeps)
    overlaps the tests instead of serializing after them. Results are exact:
    accepts are guarded by the at-test-time bound, and the stale-bound mask
    is a superset of the fresh one, so exit never skips a needed row — it
    can only run one extra (fully guarded, no-accept) iteration.
    """
    k = _SWEEP_K
    inf_row_w = bound0.shape[0]
    carry, bound = carry0, bound0
    # The prefix targets the sync-bound small-tile compacted phases; at
    # full-width tiles (1024 lanes) its unrolled live values blow the 16MB
    # scoped-VMEM stack (measured: 20.93M requested at P=6, TILE=1024),
    # and those sky-round sweeps rarely test clusters anyway.
    if _SWEEP_PREFIX > 0 and inf_row_w <= 256:
        # One selection wave for the P nearest rows (see _SWEEP_PREFIX):
        # per-row keys once, then P x (argmin extract + erase-by-value).
        # The erases depend only on the (1,1) min VALUE (vector), so the P
        # scalar index extracts issue back-to-back and their latencies
        # overlap each other and the first tests.
        masked = jnp.where(cl_entry[:, :] < bound[None, :], cl_entry[:, :],
                           jnp.inf)
        keyv = jnp.min(masked, axis=1, keepdims=True)  # (rows, 1)
        js_pre = []
        for _ in range(_SWEEP_PREFIX):
            mv = jnp.min(keyv, axis=0, keepdims=True)  # (1, 1) vector
            js_pre.append(jnp.argmin(keyv, axis=0)[0].astype(jnp.int32))
            keyv = jnp.where(keyv == mv, jnp.inf, keyv)
        inf_row = jnp.full((inf_row_w,), jnp.inf, jnp.float32)
        for j in js_pre:
            erow = cl_entry[j, :]
            carry, bound = test_one(j, erow, carry)
            cl_entry[j, :] = inf_row
    js0, key0 = _next_rowsk(cl_entry[:, :], bound, k)

    def cond(state):
        return jnp.isfinite(state[-1])

    if _PIPE_SEL:
        def body(state):
            carry, bound = state[0], state[1]
            js = state[2:2 + k]
            inf_row = jnp.full((inf_row_w,), jnp.inf, jnp.float32)
            erows = [cl_entry[j, :] for j in js]
            for j in js:
                cl_entry[j, :] = inf_row
            js_n, key_n = _next_rowsk(cl_entry[:, :], bound, k)
            for j, erow in zip(js, erows):
                carry, bound = test_one(j, erow, carry)
            return (carry, bound, *js_n, key_n)
    else:
        def body(state):
            carry, bound = state[0], state[1]
            js = state[2:2 + k]
            inf_row = jnp.full((inf_row_w,), jnp.inf, jnp.float32)
            for j in js:
                carry, bound = test_one(j, cl_entry[j, :], carry)
                cl_entry[j, :] = inf_row
            js_n, key_n = _next_rowsk(cl_entry[:, :], bound, k)
            return (carry, bound, *js_n, key_n)

    state = jax.lax.while_loop(cond, body, (carry, bound, *js0, key0))
    return state[0], state[1]


def _closest_tile_sweep(
    rays, bound0, start_ref, super_min_ref, super_max_ref, cl_planes_ref,
    table_hbm, super_entry, cl_entry, tbuf, cache_tag, sem,
    num_supers: int = 0,
):
    """Two-level front-to-back closest sweep for ONE ray tile.

    rays = (ox, oy, oz, dx, dy, dz, ix, iy, iz): (TILE,) registers.
    bound0: per-lane initial bound — t_max for live lanes; -inf parks a lane
    entirely (it selects nothing and accepts nothing).
    Returns (bt, btri): best hit distance (== bound0 where no hit) and
    leaf-order triangle index (-1 where no hit). Shared by the plain closest
    kernel and the persistent path kernel (pallas_regen.py).

    num_supers == 1 (static) takes the SINGLE-SUPER fast path: the super
    selection level is pure overhead there (one-row entry table, a
    scalar/vector sync to select it, another to exit the loop, per sweep),
    so the sweep collapses to one cluster sweep over the always-cached
    super 0 — measured 2-4us/sweep of sync on small scenes (Duck-class,
    <= 512 clusters at SUPER=64)."""
    ox, oy, oz, dx, dy, dz, ix, iy, iz = rays
    btri0 = jnp.full((bound0.shape[0],), -1, jnp.int32)

    if num_supers == 1:
        s1 = jnp.int32(0)

        def sweep_super0(bound0):
            miss1 = _fetch_super_start(table_hbm, tbuf, sem, cache_tag, s1)
            cl_entry[:, :] = _slab_entry_rows(
                cl_planes_ref[0, 0], cl_planes_ref[0, 1],
                ox, oy, oz, ix, iy, iz, bound0,
            )
            _fetch_super_wait(table_hbm, tbuf, sem, miss1, s1)

            def test_one0(j, erow, carry):
                bt, btri = carry
                need = erow < bt
                t_cand, slot = _mt_block(tbuf, j, ox, oy, oz, dx, dy, dz, bt)
                better = need & (t_cand < bt)
                tri = start_ref[j] + slot
                bt = jnp.where(better, t_cand, bt)
                btri = jnp.where(better, tri, btri)
                return (bt, btri), bt

            (bt, btri), _ = _cluster_sweep(
                tbuf, cl_entry, test_one0, bound0, (bound0, btri0)
            )
            return bt, btri

        if not _ROOT_SKIP:
            return sweep_super0(bound0)
        # Tile-level pre-reject (see _ROOT_SKIP): one 1-row slab test
        # against the root AABB; a tile with no lane entering it (sky
        # tiles, fully-parked tiles) skips the whole entry build + sweep.
        root_e = _slab_entry_rows(
            super_min_ref[:, :], super_max_ref[:, :],
            ox, oy, oz, ix, iy, iz, bound0,
        )
        return jax.lax.cond(
            jnp.min(root_e) < jnp.inf,
            lambda: sweep_super0(bound0),
            lambda: (bound0, btri0),
        )

    super_entry[:, :] = _slab_entry_rows(
        super_min_ref[:, :], super_max_ref[:, :],
        ox, oy, oz, ix, iy, iz, bound0,
    )

    s0, k0 = _next_row(super_entry[:, :], bound0)

    def s_cond(state):
        return jnp.isfinite(state[3])

    def s_body(state):
        bt, btri, s, _ = state
        miss = _fetch_super_start(table_hbm, tbuf, sem, cache_tag, s)
        cl_entry[:, :] = _slab_entry_rows(
            cl_planes_ref[s, 0], cl_planes_ref[s, 1],
            ox, oy, oz, ix, iy, iz, bt,
        )
        _fetch_super_wait(table_hbm, tbuf, sem, miss, s)

        def test_one(j, erow, carry, s=s):
            bt, btri = carry
            need = erow < bt
            t_cand, slot = _mt_block(tbuf, j, ox, oy, oz, dx, dy, dz, bt)
            better = need & (t_cand < bt)
            # Treelet clusters are variable-length leaf ranges; the
            # scalar start rides in SMEM (padding never wins: its
            # triangles are degenerate).
            tri = start_ref[s * SUPER + j] + slot
            bt = jnp.where(better, t_cand, bt)
            btri = jnp.where(better, tri, btri)
            return (bt, btri), bt

        (bt, btri), _ = _cluster_sweep(
            tbuf, cl_entry, test_one, bt, (bt, btri)
        )
        super_entry[s, :] = jnp.full((bt.shape[0],), jnp.inf, jnp.float32)
        s_next, key = _next_row(super_entry[:, :], bt)
        return bt, btri, s_next, key

    bt, btri, _, _ = jax.lax.while_loop(
        s_cond, s_body, (bound0, btri0, s0, k0)
    )
    return bt, btri


# Clusters tested per pair-sweep iteration (closest + occlusion rows share
# one selection loop, so the two tables balance the K slots between them and
# trailing-waste is rarer than in a single-table sweep at the same K).
_PAIR_K = int(os.environ.get("RAYFINDER_PAIR_K", str(_SWEEP_K)))


def _pair_tile_sweep(
    cont_rays, bound0, sh_rays, sh_bound,
    start_ref, cl_planes_ref, table_hbm, pair_entry, tbuf, cache_tag, sem,
    super_min_ref=None, super_max_ref=None,
):
    """Fused closest+occlusion sweep for ONE ray tile, single-super scenes.

    Replaces [NEE-prologue any-sweep; first closest sweep] in the persistent
    path kernel with ONE front-to-back loop over a stacked (2R, TILE) entry
    table: rows 0..R-1 are the continuation rays' cluster entries (bounded
    by the shrinking best-hit t), rows R..2R-1 the shadow rays' entries
    (bounded by the per-lane pending occlusion bound). Each iteration
    selects the _PAIR_K globally nearest needed rows and tests each with a
    single Möller-Trumbore block on scalar-selected rays — one scalar sync
    per iteration covers BOTH traversals, and the two tables split the K
    slots wherever the work actually is.

    Closest results are bit-identical to _closest_tile_sweep: the closest
    rows keep their relative front-to-back order (global argmin restricted
    to rows 0..R-1 is the same order, and shadow rows at higher indices
    never steal an equal-entry tie from them), bounds only shrink, and
    erase-safety holds per table. Occlusion is order-independent.

    cont_rays/sh_rays: 9-tuples of (TILE,) registers. bound0: per-lane
    closest bound (-inf parks). sh_bound: per-lane occlusion bound (-inf =
    no pending shadow ray). Returns (bt, btri, occ).
    """
    cox, coy, coz, cdx, cdy, cdz, cix, ciy, ciz = cont_rays
    sox, soy, soz, sdx, sdy, sdz, six, siy, siz = sh_rays
    tile = bound0.shape[0]
    rows = cl_planes_ref.shape[-1]
    btri0 = jnp.full((tile,), -1, jnp.int32)
    occ0 = jnp.zeros((tile,), jnp.int32)

    sp = jnp.int32(0)
    missp = _fetch_super_start(table_hbm, tbuf, sem, cache_tag, sp)
    inf_half = jnp.full((rows, tile), jnp.inf, jnp.float32)
    if _ROOT_SKIP and super_min_ref is not None:
        # Half-table skip guards (see _ROOT_SKIP): the closest half builds
        # only if some lane's continuation ray enters the root AABB; the
        # shadow half only if some lane has a pending NEE bound. Skipped
        # halves are written as +inf rows (never selected).
        root_c = _slab_entry_rows(
            super_min_ref[:, :], super_max_ref[:, :],
            cox, coy, coz, cix, ciy, ciz, bound0,
        )
        cont_any = jnp.min(root_c) < jnp.inf
        sh_any = jnp.max(sh_bound) > -jnp.inf

        @pl.when(cont_any)
        def _():
            pair_entry[0:rows, :] = _slab_entry_rows(
                cl_planes_ref[0, 0], cl_planes_ref[0, 1],
                cox, coy, coz, cix, ciy, ciz, bound0,
            )

        @pl.when(jnp.logical_not(cont_any))
        def _():
            pair_entry[0:rows, :] = inf_half

        @pl.when(sh_any)
        def _():
            pair_entry[rows:2 * rows, :] = _slab_entry_rows(
                cl_planes_ref[0, 0], cl_planes_ref[0, 1],
                sox, soy, soz, six, siy, siz, sh_bound,
            )

        @pl.when(jnp.logical_not(sh_any))
        def _():
            pair_entry[rows:2 * rows, :] = inf_half
    else:
        pair_entry[0:rows, :] = _slab_entry_rows(
            cl_planes_ref[0, 0], cl_planes_ref[0, 1],
            cox, coy, coz, cix, ciy, ciz, bound0,
        )
        pair_entry[rows:2 * rows, :] = _slab_entry_rows(
            cl_planes_ref[0, 0], cl_planes_ref[0, 1],
            sox, soy, soz, six, siy, siz, sh_bound,
        )
    _fetch_super_wait(table_hbm, tbuf, sem, missp, sp)
    row_io = jax.lax.broadcasted_iota(jnp.int32, (2 * rows, tile), 0)
    is_top = row_io < rows

    def pending(occ):
        return jnp.where(occ == 0, sh_bound, -jnp.inf)

    def select(bt, occ):
        bounds = jnp.where(is_top, bt[None, :], pending(occ)[None, :])
        masked = jnp.where(pair_entry[:, :] < bounds, pair_entry[:, :], jnp.inf)
        key = jnp.min(masked, axis=1, keepdims=True)  # (2R, 1)
        ids = jax.lax.broadcasted_iota(jnp.int32, key.shape, 0)
        js = []
        for _ in range(_PAIR_K):
            j = jnp.argmin(key, axis=0)[0].astype(jnp.int32)
            js.append(j)
            key = jnp.where(ids == j, jnp.inf, key)
        return js, jnp.min(masked)

    js0, key0 = select(bound0, occ0)

    def cond(state):
        return jnp.isfinite(state[-1])

    def test_rows(bt, btri, occ, js, erows):
        for j, entry_row in zip(js, erows):
            top = j < rows          # scalar: which traversal this row feeds
            jc = jnp.where(top, j, j - rows)
            ox = jnp.where(top, cox, sox)
            oy = jnp.where(top, coy, soy)
            oz = jnp.where(top, coz, soz)
            dx = jnp.where(top, cdx, sdx)
            dy = jnp.where(top, cdy, sdy)
            dz = jnp.where(top, cdz, sdz)
            mt_bound = jnp.where(top, bt, sh_bound)
            t_cand, slot = _mt_block(tbuf, jc, ox, oy, oz, dx, dy, dz, mt_bound)
            # Closest side: accept strictly-better hits for needing lanes.
            better = top & (entry_row < bt) & (t_cand < bt)
            tri = start_ref[jc] + slot
            bt = jnp.where(better, t_cand, bt)
            btri = jnp.where(better, tri, btri)
            # Occlusion side: any accept occludes a still-pending lane.
            hit_any = (~top) & jnp.isfinite(entry_row) & (occ == 0) \
                & jnp.isfinite(t_cand)
            occ = jnp.where(hit_any, jnp.int32(1), occ)
        return bt, btri, occ

    if _PIPE_SEL:
        # Pipelined selection (see _cluster_sweep): erase the carried rows,
        # select the NEXT rows against the PRE-test bounds, then test — the
        # vector->scalar row extraction overlaps the Möller-Trumbore work.
        # Stale bounds are a superset; accepts stay test-time guarded.
        def body(state):
            bt, btri, occ = state[0], state[1], state[2]
            js = state[3:3 + _PAIR_K]
            inf_row = jnp.full((tile,), jnp.inf, jnp.float32)
            erows = [pair_entry[j, :] for j in js]
            for j in js:
                pair_entry[j, :] = inf_row
            js_n, key_n = select(bt, occ)
            bt, btri, occ = test_rows(bt, btri, occ, js, erows)
            return (bt, btri, occ, *js_n, key_n)
    else:
        def body(state):
            bt, btri, occ = state[0], state[1], state[2]
            js = state[3:3 + _PAIR_K]
            inf_row = jnp.full((tile,), jnp.inf, jnp.float32)
            erows = [pair_entry[j, :] for j in js]
            bt, btri, occ = test_rows(bt, btri, occ, js, erows)
            for j in js:
                pair_entry[j, :] = inf_row
            js_n, key_n = select(bt, occ)
            return (bt, btri, occ, *js_n, key_n)

    state = jax.lax.while_loop(
        cond, body, (bound0, btri0, occ0, *js0, key0)
    )
    return state[0], state[1], state[2]


def _krays(grouped: bool, rt_count: int) -> int:
    """Rays per lane for a grouped kernel: KRAYS when it divides the
    per-grid-step tile count, else 1 (flat sweeps are always 1)."""
    if not grouped or rt_count % KRAYS:
        return 1
    return KRAYS


def _make_closest_kernel(leaf: int, num_supers: int, rt_count: int,
                         grouped: bool = False, prebuilt: bool = False):
    kr = _krays(grouped, rt_count)

    def kernel(
        o_ref, d_ref, tmax_ref, start_ref, super_min_ref, super_max_ref,
        cl_planes_ref, table_hbm,
        t_out_ref, tri_out_ref,
        *scratch,
    ):
        super_entries = list(scratch[0:kr])
        cl_entries = list(scratch[kr:2 * kr])
        tbuf, cache_tag, sem = scratch[2 * kr:2 * kr + 3]
        cur_entry = scratch[2 * kr + 3] if kr > 1 else None
        cl_all = scratch[2 * kr + 3] if prebuilt else None
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            cache_tag[0] = jnp.int32(-1)

        # fori_loop with a dynamic leading-dim tile index: the sweep body
        # compiles once instead of rt_count times (Mosaic compile time).
        def per_group(gi, _):
            rts = [gi * kr + k for k in range(kr)]
            regs = [_ray_regs(o_ref, d_ref, tmax_ref, rt) for rt in rts]
            if prebuilt:
                (o9, d9, inv9, tmax) = regs[0]
                bt, btri = _closest_tile_sweep_prebuilt(
                    o9 + d9 + inv9, tmax, cl_planes_ref, start_ref,
                    table_hbm, super_entries[0], cl_entries[0], cl_all,
                    tbuf, cache_tag, sem, num_supers,
                    super_min_ref, super_max_ref,
                )
                bts, btris = [bt], [btri]
            elif grouped:
                bts, btris = _closest_tile_sweep_grouped(
                    [(o + d + inv) for (o, d, inv, _) in regs],
                    [tmax for (_, _, _, tmax) in regs],
                    super_min_ref, super_max_ref, cl_planes_ref, start_ref,
                    table_hbm, super_entries, cl_entries, tbuf, cache_tag,
                    sem, num_supers, cur_entry=cur_entry,
                )
            else:
                ((ox, oy, oz), (dx, dy, dz), (ix, iy, iz), tmax) = regs[0]
                bt, btri = _closest_tile_sweep(
                    (ox, oy, oz, dx, dy, dz, ix, iy, iz), tmax,
                    start_ref, super_min_ref, super_max_ref, cl_planes_ref,
                    table_hbm, super_entries[0], cl_entries[0], tbuf,
                    cache_tag, sem, num_supers=num_supers,
                )
                bts, btris = [bt], [btri]
            for k, rt in enumerate(rts):
                t_out_ref[rt, 0, :] = bts[k]
                tri_out_ref[rt, 0, :] = btris[k]
            return 0

        jax.lax.fori_loop(0, rt_count // kr, per_group, 0)

    return kernel


def _any_tile_sweep(
    rays, tmax, start_ref, super_min_ref, super_max_ref, cl_planes_ref,
    table_hbm, super_entry, cl_entry, tbuf, cache_tag, sem,
    num_supers: int = 0,
):
    """Early-exit occlusion sweep for ONE ray tile: keep testing the nearest
    super / cluster any unoccluded lane still overlaps; once every lane is
    occluded (or nothing overlaps) the selection key goes +inf.

    rays as in _closest_tile_sweep; tmax: per-lane bound (-inf parks a lane
    as pre-occluded-irrelevant). Returns occ (TILE,) int32 (Mosaic cannot
    legalize i1-vector carries). Shared by the any-hit kernel and the
    persistent path kernel's NEE prologue (pallas_regen.py).
    num_supers == 1: single-super fast path as in _closest_tile_sweep."""
    ox, oy, oz, dx, dy, dz, ix, iy, iz = rays

    def pending_bound(occ):
        # Unoccluded lanes keep their tmax bound; occluded lanes drop
        # out by bounding at -inf (no entry can be < -inf).
        return jnp.where(occ == 0, tmax, -jnp.inf)

    occ0 = jnp.zeros((tmax.shape[0],), jnp.int32)

    if num_supers == 1:
        s1 = jnp.int32(0)

        def sweep_super0():
            miss1 = _fetch_super_start(table_hbm, tbuf, sem, cache_tag, s1)
            cl_entry[:, :] = _slab_entry_rows(
                cl_planes_ref[0, 0], cl_planes_ref[0, 1],
                ox, oy, oz, ix, iy, iz, tmax,
            )
            _fetch_super_wait(table_hbm, tbuf, sem, miss1, s1)

            def test_one0(j, erow, occ):
                need = jnp.isfinite(erow) & (occ == 0)
                t_cand, _ = _mt_block(tbuf, j, ox, oy, oz, dx, dy, dz, tmax)
                occ = jnp.where(need & jnp.isfinite(t_cand), jnp.int32(1), occ)
                return occ, pending_bound(occ)

            occ, _ = _cluster_sweep(
                tbuf, cl_entry, test_one0, pending_bound(occ0), occ0
            )
            return occ

        if not _ROOT_SKIP:
            return sweep_super0()
        # Tile-level skip (see _ROOT_SKIP): a tile with no pending bound
        # (no live shadow ray — the common case for sky tiles and the NEE
        # prologue of drained tiles) skips the entry build + sweep.
        return jax.lax.cond(
            jnp.max(pending_bound(occ0)) > -jnp.inf,
            sweep_super0,
            lambda: occ0,
        )

    super_entry[:, :] = _slab_entry_rows(
        super_min_ref[:, :], super_max_ref[:, :],
        ox, oy, oz, ix, iy, iz, tmax,
    )

    s0, k0 = _next_row(super_entry[:, :], pending_bound(occ0))

    def s_cond(state):
        return jnp.isfinite(state[2])

    def s_body(state):
        occ, s, _ = state
        miss = _fetch_super_start(table_hbm, tbuf, sem, cache_tag, s)
        cl_entry[:, :] = _slab_entry_rows(
            cl_planes_ref[s, 0], cl_planes_ref[s, 1],
            ox, oy, oz, ix, iy, iz, pending_bound(occ),
        )
        _fetch_super_wait(table_hbm, tbuf, sem, miss, s)

        def test_one(j, erow, occ):
            need = jnp.isfinite(erow) & (occ == 0)
            t_cand, _ = _mt_block(tbuf, j, ox, oy, oz, dx, dy, dz, tmax)
            occ = jnp.where(need & jnp.isfinite(t_cand), jnp.int32(1), occ)
            return occ, pending_bound(occ)

        occ, _ = _cluster_sweep(
            tbuf, cl_entry, test_one, pending_bound(occ), occ
        )
        super_entry[s, :] = jnp.full((occ.shape[0],), jnp.inf, jnp.float32)
        s_next, key = _next_row(super_entry[:, :], pending_bound(occ))
        return occ, s_next, key

    occ, _, _ = jax.lax.while_loop(s_cond, s_body, (occ0, s0, k0))
    return occ


def _make_any_kernel(leaf: int, num_supers: int, rt_count: int,
                     grouped: bool = False, prebuilt: bool = False):
    kr = _krays(grouped, rt_count)

    def kernel(
        o_ref, d_ref, tmax_ref, start_ref, super_min_ref, super_max_ref,
        cl_planes_ref, table_hbm,
        occ_out_ref,
        *scratch,
    ):
        super_entries = list(scratch[0:kr])
        cl_entries = list(scratch[kr:2 * kr])
        tbuf, cache_tag, sem = scratch[2 * kr:2 * kr + 3]
        cur_entry = scratch[2 * kr + 3] if kr > 1 else None
        cl_all = scratch[2 * kr + 3] if prebuilt else None
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            cache_tag[0] = jnp.int32(-1)

        def per_group(gi, _):
            rts = [gi * kr + k for k in range(kr)]
            regs = [_ray_regs(o_ref, d_ref, tmax_ref, rt) for rt in rts]
            if prebuilt:
                (o9, d9, inv9, tmax) = regs[0]
                occs = [_any_tile_sweep_prebuilt(
                    o9 + d9 + inv9, tmax, cl_planes_ref, table_hbm,
                    super_entries[0], cl_entries[0], cl_all, tbuf,
                    cache_tag, sem, num_supers,
                    super_min_ref, super_max_ref,
                )]
            elif grouped:
                occs = _any_tile_sweep_grouped(
                    [(o + d + inv) for (o, d, inv, _) in regs],
                    [tmax for (_, _, _, tmax) in regs],
                    super_min_ref, super_max_ref, cl_planes_ref,
                    table_hbm, super_entries, cl_entries, tbuf, cache_tag,
                    sem, num_supers, cur_entry=cur_entry,
                )
            else:
                ((ox, oy, oz), (dx, dy, dz), (ix, iy, iz), tmax) = regs[0]
                occs = [_any_tile_sweep(
                    (ox, oy, oz, dx, dy, dz, ix, iy, iz), tmax,
                    start_ref, super_min_ref, super_max_ref, cl_planes_ref,
                    table_hbm, super_entries[0], cl_entries[0], tbuf,
                    cache_tag, sem, num_supers=num_supers,
                )]
            for k, rt in enumerate(rts):
                occ_out_ref[rt, 0, :] = occs[k]
            return 0

        jax.lax.fori_loop(0, rt_count // kr, per_group, 0)

    return kernel


def _prep_rays(origin, direction, t_max, tile: int, rt: int):
    """Pad to a tile*rt multiple and lay out as (tiles, 3, tile) SoA."""
    num_rays = origin.shape[0]
    padded = -(-num_rays // (tile * rt)) * (tile * rt)
    pad = padded - num_rays
    if pad:
        origin = jnp.concatenate([origin, jnp.full((pad, 3), 1e30, jnp.float32)])
        direction = jnp.concatenate(
            [direction, jnp.tile(jnp.asarray([[1.0, 0.0, 0.0]], jnp.float32), (pad, 1))]
        )
        t_max = jnp.concatenate([t_max, jnp.full((pad,), 1.0, jnp.float32)])
    tiles = padded // tile
    o = origin.reshape(tiles, tile, 3).transpose(0, 2, 1)
    d = direction.reshape(tiles, tile, 3).transpose(0, 2, 1)
    tm = t_max.reshape(tiles, 1, tile)
    return o, d, tm, tiles, num_rays


def _scene_tables(scene):
    """Pad clusters to a SUPER multiple; emit the kernel layouts:
    table (S, 9, SUPER, L) — vertex rows leading so a super's DMA slice has
    aligned (SUPER, L) minor dims — super planes (3, S), cluster planes
    (S, 2, 3, SUPER) — [s, 0] mins, [s, 1] maxs."""
    num_clusters, leaf = scene.cluster_tris.shape[:2]
    num_supers = -(-num_clusters // SUPER)
    pad = num_supers * SUPER - num_clusters

    table = scene.cluster_tris.reshape(num_clusters, leaf, 9).transpose(0, 2, 1)
    cl_min = scene.cluster_min
    cl_max = scene.cluster_max
    if pad:
        table = jnp.concatenate([table, jnp.zeros((pad, 9, leaf), jnp.float32)], axis=0)
        # Far-away degenerate boxes: the slab test can never accept them.
        cl_min = jnp.concatenate([cl_min, jnp.full((pad, 3), _FAR)], axis=0)
        cl_max = jnp.concatenate([cl_max, jnp.full((pad, 3), _FAR)], axis=0)

    table = table.reshape(num_supers, SUPER, 9, leaf).transpose(0, 2, 1, 3)
    # Exclude the FAR pad point-boxes from the super unions (identities
    # +inf/-inf), else a padded super's max corner blows out to 1e30 and
    # the super box stops pruning on its far side (see
    # _scene_tables_grouped). Cluster-level rows keep the FAR planes.
    pad_mask = cl_min[:, 0:1] >= _FAR
    min_src = jnp.where(pad_mask, jnp.float32(jnp.inf), cl_min)
    max_src = jnp.where(pad_mask, jnp.float32(-jnp.inf), cl_max)
    groups_min = cl_min.reshape(num_supers, SUPER, 3)
    groups_max = cl_max.reshape(num_supers, SUPER, 3)
    super_min = jnp.min(min_src.reshape(num_supers, SUPER, 3), axis=1).T
    super_max = jnp.max(max_src.reshape(num_supers, SUPER, 3), axis=1).T
    cl_planes = jnp.stack(
        [groups_min.transpose(0, 2, 1), groups_max.transpose(0, 2, 1)], axis=1
    )  # (S, 2, 3, SUPER)
    starts = scene.cluster_start
    if pad:
        starts = jnp.concatenate([starts, jnp.zeros((pad,), jnp.int32)])
    return table, starts, super_min, super_max, cl_planes


def _interpret() -> bool:
    """Run kernels in interpreter mode off-TPU (CPU tests)."""
    return jax.default_backend() != "tpu"


def _full_spec(shape):
    zeros = tuple(0 for _ in shape)
    return pl.BlockSpec(shape, lambda i, z=zeros: z, memory_space=pltpu.VMEM)


def _walk_tables_and_specs(scene):
    """Scene tables + the pallas specs/scratch that depend on the traversal
    layout (flat vs grouped). Returns (grouped, tables, start_spec,
    scratch_shapes_fn) where tables = (table, starts, super_min, super_max,
    cl_planes) and scratch_shapes_fn(num_supers, tile) builds the scratch
    list (super entry, cluster entry, triangle buffer, cache tag, DMA sem)."""
    leaf = scene.cluster_tris.shape[1]
    grouped = _grouped_mode(scene.cluster_tris.shape[0])
    if grouped:
        table, starts, super_min, super_max, cl_planes = _scene_tables_grouped(scene)
        start_spec = _full_spec(starts.shape)  # (S, 8, G_dma) f32 in VMEM
        # cl_entry spans the selection rows; tbuf spans the DMA'd lanes.
        cl_rows, tbuf_shape = cl_planes.shape[-1], (9, leaf, table.shape[-1])
    else:
        table, starts, super_min, super_max, cl_planes = _scene_tables(scene)
        # Per-cluster start offsets: scalars, read one at a time.
        start_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
        cl_rows, tbuf_shape = SUPER, (9, SUPER, leaf)

    def scratch(num_supers, tile, kr=1):
        # kr super-entry tables + kr cluster-entry tables (K-aggregation:
        # one per resident ray set), one shared triangle buffer + DMA slot.
        # kr > 1 appends the ACTIVE entry table for the monotone-act
        # selection (_act_select) at index 2*kr + 3; the prebuilt path
        # (grouped, kr == 1) appends the (S*G, TILE) all-clusters entry
        # table at the same slot (mutually exclusive with kr > 1).
        # NOTE kr > 1 VMEM: each extra ray set costs a (cl_rows, tile) f32
        # table; at SUPER_G=512 (banked gather) that is +256KB per set on
        # top of the tbuf — verify scoped VMEM before combining them.
        prebuilt = grouped and _use_prebuilt(num_supers, cl_rows, tile, kr)
        return (
            [pltpu.VMEM((num_supers, tile), jnp.float32) for _ in range(kr)]
            + [pltpu.VMEM((cl_rows, tile), jnp.float32) for _ in range(kr)]
            + [
                pltpu.VMEM(tbuf_shape, jnp.float32),
                pltpu.SMEM((1,), jnp.int32),
                pltpu.SemaphoreType.DMA(()),
            ]
            + ([pltpu.VMEM((cl_rows, tile), jnp.float32)] if kr > 1 else [])
            + ([pltpu.VMEM((num_supers * cl_rows, tile), jnp.float32)]
               if prebuilt else [])
        )

    return grouped, (table, starts, super_min, super_max, cl_planes), start_spec, scratch


def _common_call(scene, origin, direction, t_max, kernel_factory, out_dtypes):
    leaf = scene.cluster_tris.shape[1]
    num_rays = origin.shape[0]
    t_max = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (num_rays,))

    tile, rt = _pick_tile(scene.cluster_tris.shape[0])
    o, d, tm, tiles, n = _prep_rays(origin, direction, t_max, tile, rt)
    grouped, tables, start_spec, scratch = _walk_tables_and_specs(scene)
    table, starts, super_min, super_max, cl_planes = tables
    num_supers = table.shape[0]

    prebuilt = grouped and _use_prebuilt(
        num_supers, cl_planes.shape[-1], tile, _krays(grouped, rt)
    )
    outs = pl.pallas_call(
        kernel_factory(leaf, num_supers, rt, grouped=grouped,
                       prebuilt=prebuilt),
        grid=(tiles // rt,),
        in_specs=[
            pl.BlockSpec((rt, 3, tile), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((rt, 3, tile), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((rt, 1, tile), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            start_spec,
            _full_spec(super_min.shape),
            _full_spec(super_max.shape),
            _full_spec(cl_planes.shape),
            # The triangle table stays in HBM; supers are DMA'd on demand.
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec((rt, 1, tile), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
            for _ in out_dtypes
        ],
        out_shape=[jax.ShapeDtypeStruct((tiles, 1, tile), dt) for dt in out_dtypes],
        scratch_shapes=scratch(num_supers, tile, _krays(grouped, rt)),
        interpret=_interpret(),
    )(o, d, tm, starts, super_min, super_max, cl_planes, table)
    return outs, n, t_max


@jax.jit
def pallas_intersect_closest(scene, origin, direction, t_max):
    """Closest-hit sweep. Returns (hit, t, tri_idx) — tri in real indices.

    Padding slots are degenerate triangles (bvh/clusters.py) that can never
    win, so the kernel's `cluster * leaf + slot` IS the real leaf-order
    triangle index — no remap gather (TPU gathers cost ~13ns/row; this one
    was ~2ms per pass at 800x600)."""
    (t_out, tri_out), n, t_max = _common_call(
        scene, origin, direction, t_max, _make_closest_kernel, (jnp.float32, jnp.int32)
    )
    t = t_out.reshape(-1)[:n]
    tri = tri_out.reshape(-1)[:n]
    hit = tri >= 0
    return hit, jnp.where(hit, t, t_max[:n]), tri


@jax.jit
def pallas_intersect_any(scene, origin, direction, t_max):
    """Any-hit sweep. Returns occluded (B,) bool."""
    (occ,), n, _ = _common_call(
        scene, origin, direction, t_max, _make_any_kernel, (jnp.int32,)
    )
    return occ.reshape(-1)[:n] > 0
