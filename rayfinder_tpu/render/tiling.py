"""Pixel swizzling: block-major ray order for traversal coherence.

The traversal engines prune work per TILE-ray tile; rays laid out in image
row-major order make a tile span a whole framebuffer row, whose frustum
overlaps many clusters. Swizzling pixels into BLOCK_W x BLOCK_H blocks
(exactly one Pallas tile per block) tightens each tile's spatial footprint,
so the block-uniform pruning skips far more geometry.

The permutation is static per framebuffer size: the path tracer generates
rays, shades, and accumulates entirely in block order and unswizzles once at
image-assembly time (zero per-sample cost).
"""

from __future__ import annotations

import functools

import numpy as np

import os

# Block area tracks the Pallas traversal tile size so each tile covers
# exactly one contiguous pixel block (16x8 at the default TILE=128,
# 32x16 at TILE=512). Near-square blocks minimize the tile frustum.
from ..ops.pallas_walk import TILE as _TILE  # noqa: E402


def _default_block_w(tile: int) -> int:
    w = 1
    while w * w < tile:
        w *= 2
    return w


BLOCK_W = int(os.environ.get("RAYFINDER_BLOCK_W", str(_default_block_w(_TILE))))
BLOCK_H = max(_TILE // BLOCK_W, 1)


@functools.lru_cache(maxsize=8)
def block_order(width: int, height: int):
    """Returns (ys, xs, pixel_idx): pixel coordinates in block-major order
    and the flat row-major pixel index of each position (all (H*W,) int32)."""
    ys_out = []
    xs_out = []
    for by in range(0, height, BLOCK_H):
        for bx in range(0, width, BLOCK_W):
            h = min(BLOCK_H, height - by)
            w = min(BLOCK_W, width - bx)
            yy, xx = np.meshgrid(
                np.arange(by, by + h), np.arange(bx, bx + w), indexing="ij"
            )
            ys_out.append(yy.reshape(-1))
            xs_out.append(xx.reshape(-1))
    ys = np.concatenate(ys_out).astype(np.int32)
    xs = np.concatenate(xs_out).astype(np.int32)
    return ys, xs, (ys.astype(np.int64) * width + xs).astype(np.int32)


def unswizzle(flat_block_ordered, width: int, height: int):
    """(H*W, ...) block-ordered -> row-major flat order."""
    import jax.numpy as jnp

    _, _, pixel_idx = block_order(width, height)
    out_shape = (height * width,) + flat_block_ordered.shape[1:]
    return jnp.zeros(out_shape, flat_block_ordered.dtype).at[jnp.asarray(pixel_idx)].set(
        flat_block_ordered
    )
