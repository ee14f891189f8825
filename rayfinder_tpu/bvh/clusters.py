"""Triangle clusters: the TPU-native acceleration structure.

A TPU is a dense vector machine: per-lane pointer chasing (the reference's
per-thread BVH stack, ray_intersection.cpp:138-213) maps poorly onto it, so
the wavefront engine replaces deep traversal with a shallow two-stage scheme:

1. triangles — already spatially sorted by the SAH builder's depth-first leaf
   order — are chunked into fixed-size clusters of LEAF_SIZE consecutive
   triangles with precomputed AABBs;
2. rays are culled against cluster AABBs densely (VPU-friendly, no gathers),
   surviving (ray, cluster) pairs are compacted, and each pair intersects its
   cluster's whole triangle block as one dense Möller-Trumbore batch.

This trades ~2-4x more triangle tests for fully regular, gather-light compute
— the right trade on TPU hardware.
"""

from __future__ import annotations

import dataclasses
import os

import numpy as np

DEFAULT_LEAF_SIZE = int(os.environ.get("RAYFINDER_LEAF", "128"))


@dataclasses.dataclass
class ClusterSet:
    """Host-side cluster arrays (C clusters of L triangles each)."""

    tris: np.ndarray  # (C, L, 3, 3) f32, padded blocks
    aabb_min: np.ndarray  # (C, 3) f32
    aabb_max: np.ndarray  # (C, 3) f32
    tri_map: np.ndarray  # (C * L,) int32: padded slot -> real triangle index

    @property
    def num_clusters(self) -> int:
        return self.tris.shape[0]

    @property
    def leaf_size(self) -> int:
        return self.tris.shape[1]


def build_clusters(tri_positions: np.ndarray, leaf_size: int = DEFAULT_LEAF_SIZE) -> ClusterSet:
    """Chunk leaf-ordered triangles into padded fixed-size clusters.

    Padding slots are DEGENERATE (all-zero) triangles: Möller-Trumbore rejects
    them unconditionally (|det| = 0 < EPSILON), so a padded slot can never win
    an argmin — which makes `cluster_idx * leaf + slot` the real leaf-order
    triangle index directly, with no remap gather on the hot path. tri_map is
    kept (identity, tail clamped in-range) for engines that still index it.
    Cluster AABBs cover only the real triangles.
    """
    tri_positions = np.ascontiguousarray(tri_positions, dtype=np.float32)
    num_tris = tri_positions.shape[0]
    num_clusters = -(-num_tris // leaf_size)
    padded = num_clusters * leaf_size

    tri_map = np.arange(padded, dtype=np.int32)
    tris = np.zeros((padded, 3, 3), dtype=np.float32)
    tris[:num_tris] = tri_positions
    if padded > num_tris:
        tri_map[num_tris:] = (num_clusters - 1) * leaf_size

    blocks = tris.reshape(num_clusters, leaf_size, 3, 3)
    # AABBs over real triangles only (the zero padding would otherwise drag
    # the last cluster's box to the origin).
    mask = (np.arange(padded) < num_tris).reshape(num_clusters, leaf_size, 1, 1)
    aabb_min = np.where(mask, blocks, np.inf).min(axis=(1, 2))
    aabb_max = np.where(mask, blocks, -np.inf).max(axis=(1, 2))
    return ClusterSet(
        tris=blocks,
        aabb_min=aabb_min,
        aabb_max=aabb_max,
        tri_map=tri_map,
    )
