"""Pixel swizzling: hierarchical block-major ray order for traversal
coherence.

The traversal engines prune work per TILE-ray tile; rays laid out in image
row-major order make a tile span a whole framebuffer row, whose frustum
overlaps many clusters. Swizzling pixels into near-square blocks (exactly
one Pallas tile per block) tightens each tile's spatial footprint, so the
block-uniform pruning skips far more geometry.

The order is TWO-LEVEL because different passes want different tile sizes
(measured on v5e, Duck 64spp): the full-width primary/sky phase is
sync-bound and wants 512-lane tiles, while the compacted bounce phases are
divergence-bound and want 128-lane tiles. Pixels are laid out as 32x16
blocks (one 512-lane tile each) whose interiors are four 16x8 sub-blocks
(one 128-lane tile each) — so BOTH tile sizes land on compact near-square
footprints. Larger tiles (1024+) see pairs of adjacent blocks; smaller
(64) see 8x8 halves of a sub-block.

The permutation is static per framebuffer size: the path tracer generates
rays, shades, and accumulates entirely in block order and unswizzles once
at image-assembly time (zero per-sample cost).
"""

from __future__ import annotations

import functools
import os

import numpy as np

# Sub-block = one small (bounce-phase) tile; block = one large (full-width
# phase) tile = SUBDIV x SUBDIV sub-blocks.
SUB_W = int(os.environ.get("RAYFINDER_BLOCK_W", "16"))
SUB_H = int(os.environ.get("RAYFINDER_BLOCK_H", "8"))
_SUBDIV = 2
BLOCK_W = SUB_W * _SUBDIV
BLOCK_H = SUB_H * _SUBDIV
# Backwards-compat aliases used by docs/tests: the fine-tile block shape.


def _span_order(x0: int, y0: int, w: int, h: int):
    """Pixel coords covering [x0,x0+w) x [y0,y0+h) as whole 16x8 sub-blocks
    (row-major inside each), clamped at the span edges."""
    ys_out, xs_out = [], []
    for sy in range(y0, y0 + h, SUB_H):
        for sx in range(x0, x0 + w, SUB_W):
            hh = min(SUB_H, y0 + h - sy)
            ww = min(SUB_W, x0 + w - sx)
            yy, xx = np.meshgrid(
                np.arange(sy, sy + hh), np.arange(sx, sx + ww), indexing="ij"
            )
            ys_out.append(yy.reshape(-1))
            xs_out.append(xx.reshape(-1))
    return ys_out, xs_out


@functools.lru_cache(maxsize=8)
def block_order(width: int, height: int):
    """Returns (ys, xs, pixel_idx): pixel coordinates in hierarchical
    block-major order and the flat row-major pixel index of each position
    (all (H*W,) int32)."""
    ys_out = []
    xs_out = []
    for by in range(0, height, BLOCK_H):
        for bx in range(0, width, BLOCK_W):
            h = min(BLOCK_H, height - by)
            w = min(BLOCK_W, width - bx)
            ys, xs = _span_order(bx, by, w, h)
            ys_out.extend(ys)
            xs_out.extend(xs)
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
