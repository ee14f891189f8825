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

import numpy as np

DEFAULT_LEAF_SIZE = 128


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

    Padding replicates the block's first triangle, which cannot produce wrong
    results (a duplicate surface hits at the same t) and maps back to the real
    index through tri_map.
    """
    tri_positions = np.ascontiguousarray(tri_positions, dtype=np.float32)
    num_tris = tri_positions.shape[0]
    num_clusters = -(-num_tris // leaf_size)
    padded = num_clusters * leaf_size

    tri_map = np.arange(padded, dtype=np.int32)
    tris = np.empty((padded, 3, 3), dtype=np.float32)
    tris[:num_tris] = tri_positions
    if padded > num_tris:
        first_of_last = (num_clusters - 1) * leaf_size
        tris[num_tris:] = tri_positions[first_of_last]
        tri_map[num_tris:] = first_of_last

    blocks = tris.reshape(num_clusters, leaf_size, 3, 3)
    return ClusterSet(
        tris=blocks,
        aabb_min=blocks.min(axis=(1, 2)),
        aabb_max=blocks.max(axis=(1, 2)),
        tri_map=tri_map,
    )
