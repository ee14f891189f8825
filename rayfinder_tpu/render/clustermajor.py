"""Cluster-major traversal: per-ray nearest-W MT + compacted tail resolve.

The round-4 structural replacement for tile-sweep traversal on big enclosed
scenes. The grouped Pallas sweeps pay block-uniform divergence: a 128-lane
tile tests the UNION of its lanes' overlapped clusters (~20 cluster tests
per lane-equivalent on the courtyard), while each ray needs only ~1.7.
This engine does the per-ray thing the reference's stack walk does
(src/common/ray_intersection.cpp:138-213) but in dense XLA:

1. **Cull** (chunked): slab-test rays against every cluster AABB and keep
   each ray's W+1 nearest entry distances + ids via W+1 min-extract passes
   over the (chunk, C) entry grid — much cheaper than the wavefront
   engine's full `lax.top_k(32)` ordering.
2. **Wave 1**: `_walk_closest` over the top-W slots only. Measured on the
   courtyard (prof/study_clustermajor.py): the 2 nearest clusters resolve
   100% of primaries and 93-98% of bounce rays EXACTLY, so the while-loop
   runs at most 2 gather+MT rounds instead of the tile sweep's ~20.
3. **Tail**: rays whose (W+1)-th entry is nearer than their best hit are
   not proven done. They are compacted (one `nonzero` + gather) into large
   sub-batches and re-walked by the wavefront machinery at top_k capacity
   with their TIGHTENED per-ray bound, with the wavefront's full-capacity
   escalation as the final exactness backstop. 2.5-6.8% of bounce rays
   take this path; results are exact for every ray.

Same closest/any-hit contract as wavefront.py (and the reference's
rayColor queries, src/pt/reference_path_tracer.wgsl:321-429): exact
minima / exact occlusion over the same accepted triangle set.
"""

from __future__ import annotations

import os
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from .scene import DeviceScene
from .wavefront import (
    _order_clusters,
    _pad_rays,
    _slab_entry,
    _walk_any,
    _walk_closest,
)

# Nearest clusters MT'd for every ray before the compacted tail. 2 covers
# 93-100% of courtyard rays exactly (prof/study_clustermajor.py); the cull
# keeps W+1 slots so the (W+1)-th entry is the done-proof threshold.
WAVE_W = int(os.environ.get("RAYFINDER_CM_W", "2"))
# Wavefront capacity for tail sub-batches: per-ray bounds are tightened by
# wave 1, so overlap rarely exceeds this; the wavefront escalation handles
# the rest exactly.
TAIL_K = int(os.environ.get("RAYFINDER_CM_TAIL_K", "16"))
_CULL_CHUNK = 65536  # rays per (chunk, C) cull grid (~227MB at C=868)
_MAX_CULL_ENTRIES = 64 * 1024 * 1024


def _cull_chunk_size(num_clusters: int, num_rays: int) -> int:
    chunk = _CULL_CHUNK
    while chunk > 1024 and chunk * num_clusters > _MAX_CULL_ENTRIES:
        chunk //= 2
    while chunk > 1024 and chunk // 2 >= num_rays:
        chunk //= 2
    return chunk


def _top_entries(scene: DeviceScene, origin, direction, t_max, k: int):
    """Per-ray k nearest cluster entries: (B, k) ascending entry distances
    (inf past the last overlap) + (B, k) cluster ids. k min-extract passes
    over the dense (B, C) entry grid — O(kC) elementwise VPU work, no sort
    network (lax.top_k would sort all C per ray)."""
    inv_dir = jnp.float32(1.0) / direction
    dir_neg = inv_dir < 0.0
    hit, t_entry = _slab_entry(
        origin[:, None, :],
        inv_dir[:, None, :],
        dir_neg[:, None, :],
        scene.cluster_min[None, :, :],
        scene.cluster_max[None, :, :],
        t_max[:, None],
    )
    e = jnp.where(hit, t_entry, jnp.inf)  # (B, C)
    entries = []
    cids = []
    for _ in range(k):
        a = jnp.argmin(e, axis=1)
        m = jnp.take_along_axis(e, a[:, None], axis=1)[:, 0]
        entries.append(m)
        cids.append(a.astype(jnp.int32))
        e = jnp.where(
            jax.lax.broadcasted_iota(jnp.int32, e.shape, 1) == a[:, None],
            jnp.inf, e,
        )
    return jnp.stack(entries, axis=1), jnp.stack(cids, axis=1)


def _chunked_top_entries(scene, origin, direction, t_max, k: int):
    num_rays = origin.shape[0]
    num_clusters = scene.cluster_min.shape[0]
    chunk = _cull_chunk_size(num_clusters, num_rays)
    if num_rays <= chunk:
        return _top_entries(scene, origin, direction, t_max, k)
    origin, direction, t_max, n = _pad_rays(origin, direction, t_max, chunk)
    num_chunks = origin.shape[0] // chunk
    e, c = jax.lax.map(
        lambda args: _top_entries(scene, *args, k),
        (
            origin.reshape(num_chunks, chunk, 3),
            direction.reshape(num_chunks, chunk, 3),
            t_max.reshape(num_chunks, chunk),
        ),
    )
    return e.reshape(-1, k)[:n], c.reshape(-1, k)[:n]


def _tail_chunk(num_rays: int) -> int:
    """Static tail sub-batch size: large enough that one pass usually
    resolves everything (<=12.5% of rays unresolved measured q100 ~7%),
    bounded below for tiny batches."""
    return max(1024, min(num_rays, -(-num_rays // 8 // 1024) * 1024))


def _tail_resolve_closest(scene, origin, direction, unresolved, hit, t, tri):
    """Re-walk `unresolved` rays (compacted, large chunks) at TAIL_K
    capacity with their tightened per-ray bound; unproven rays (overflow
    without a dominating hit) fall through to the wavefront's full-capacity
    escalation. Exact for every ray; runs zero iterations when nothing is
    unresolved."""
    from .wavefront import _escalate

    num_rays = origin.shape[0]
    num_clusters = scene.cluster_tris.shape[0]
    chunk = _tail_chunk(num_rays)
    k = min(TAIL_K, num_clusters)

    def cond(st):
        return jnp.any(st[0])

    def body(st):
        unresolved, hit, t, tri = st
        idx = jnp.nonzero(unresolved, size=chunk, fill_value=num_rays)[0]
        idx = idx.astype(jnp.int32)
        valid = idx < num_rays
        safe = jnp.minimum(idx, num_rays - 1)
        o, d, tm = origin[safe], direction[safe], t[safe]  # bound = best so far
        entry, cids, overflow = _order_clusters(scene, o, d, tm, k)
        h2, t2, tri2 = _walk_closest(scene, o, d, tm, entry, cids)
        unproven = valid & overflow & ~(h2 & (t2 <= entry[:, -1]))
        if k < num_clusters:
            h2, t2, tri2 = _escalate(
                scene, o, d, tm, unproven,
                lambda o_, d_, tm_, e_, c_: _walk_closest(
                    scene, o_, d_, tm_, e_, c_),
                (h2, t2, tri2),
            )
        better = valid & h2 & (t2 < t[safe])
        hit = hit.at[idx].set(jnp.where(better, True, hit[safe]), mode="drop")
        t = t.at[idx].set(jnp.where(better, t2, t[safe]), mode="drop")
        tri = tri.at[idx].set(jnp.where(better, tri2, tri[safe]), mode="drop")
        unresolved = unresolved.at[idx].set(False, mode="drop")
        return unresolved, hit, t, tri

    _, hit, t, tri = jax.lax.while_loop(cond, body, (unresolved, hit, t, tri))
    return hit, t, tri


def _tail_resolve_any(scene, origin, direction, t_max, unresolved, occluded):
    from .wavefront import _escalate

    num_rays = origin.shape[0]
    num_clusters = scene.cluster_tris.shape[0]
    chunk = _tail_chunk(num_rays)
    k = min(TAIL_K, num_clusters)

    def cond(st):
        return jnp.any(st[0])

    def body(st):
        unresolved, occluded = st
        idx = jnp.nonzero(unresolved, size=chunk, fill_value=num_rays)[0]
        idx = idx.astype(jnp.int32)
        valid = idx < num_rays
        safe = jnp.minimum(idx, num_rays - 1)
        o, d, tm = origin[safe], direction[safe], t_max[safe]
        entry, cids, overflow = _order_clusters(scene, o, d, tm, k)
        occ2 = _walk_any(scene, o, d, tm, entry, cids)
        unproven = valid & overflow & ~occ2
        if k < num_clusters:
            (occ2,) = _escalate(
                scene, o, d, tm, unproven,
                lambda o_, d_, tm_, e_, c_: (
                    _walk_any(scene, o_, d_, tm_, e_, c_),),
                (occ2,),
            )
        occluded = occluded.at[idx].set(
            jnp.where(valid, occ2 | occluded[safe], occluded[safe]),
            mode="drop",
        )
        unresolved = unresolved.at[idx].set(False, mode="drop")
        return unresolved, occluded

    _, occluded = jax.lax.while_loop(cond, body, (unresolved, occluded))
    return occluded


@partial(jax.jit, static_argnames=("wave_w",))
def intersect_closest_cm(
    scene: DeviceScene, origin, direction, t_max, *, wave_w: int = WAVE_W
):
    """Closest-hit query, cluster-major. Returns (hit, t, tri_idx,
    tail_count). Exact for every ray: wave 1 MTs each ray's wave_w nearest
    clusters; a ray is proven done iff its (wave_w+1)-th entry is not
    nearer than its best hit (untested clusters all enter later, and a
    triangle hit is never nearer than its cluster's entry); the rest
    resolve in the compacted tail. tail_count is observability."""
    num_rays = origin.shape[0]
    num_clusters = scene.cluster_tris.shape[0]
    w = min(wave_w, num_clusters)
    t_max = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (num_rays,))
    k = min(w + 1, num_clusters)
    e, c = _chunked_top_entries(scene, origin, direction, t_max, k)
    hit, t, tri = _walk_closest(scene, origin, direction, t_max,
                                e[:, :w], c[:, :w])
    if k > w:  # otherwise every cluster was tested: proven done
        unresolved = e[:, w] < t
        tail_count = jnp.sum(unresolved.astype(jnp.int32))
        hit, t, tri = _tail_resolve_closest(
            scene, origin, direction, unresolved, hit, t, tri)
    else:
        tail_count = jnp.int32(0)
    return hit, t, tri, tail_count


@partial(jax.jit, static_argnames=("wave_w",))
def intersect_any_cm(
    scene: DeviceScene, origin, direction, t_max, *, wave_w: int = WAVE_W
):
    """Any-hit (shadow) query, cluster-major. Returns (occluded,
    tail_count). A ray is proven done when some tested cluster occluded it
    or no untested cluster remains (its (wave_w+1)-th entry is inf)."""
    num_rays = origin.shape[0]
    num_clusters = scene.cluster_tris.shape[0]
    w = min(wave_w, num_clusters)
    t_max = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (num_rays,))
    k = min(w + 1, num_clusters)
    e, c = _chunked_top_entries(scene, origin, direction, t_max, k)
    occluded = _walk_any(scene, origin, direction, t_max, e[:, :w], c[:, :w])
    if k > w:
        unresolved = ~occluded & jnp.isfinite(e[:, w])
        tail_count = jnp.sum(unresolved.astype(jnp.int32))
        occluded = _tail_resolve_any(
            scene, origin, direction, t_max, unresolved, occluded)
    else:
        tail_count = jnp.int32(0)
    return occluded, tail_count
