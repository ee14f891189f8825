"""Device texture sampling from the packed BGRA texel atlas.

Matches the reference's nearest-neighbor lookup with fract-wrapped UVs, BGRA
unpack, and pow-2.2 sRGB→linear conversion
(reference_path_tracer.wgsl:546-565, evalTexture wgsl:303-307).
"""

from __future__ import annotations

import jax.numpy as jnp

from .scene import DeviceScene


def eval_texture(scene: DeviceScene, texture_idx, uv):
    """Linear-space albedo for per-lane texture indices and UVs.

    texture_idx: (B,) int32; uv: (B, 2) f32. Returns (B, 3) f32.
    """
    # One (B, 3) row gather for the whole descriptor — TPU gathers are
    # row-count bound, so three separate (B,) gathers cost ~3x this.
    desc = scene.tex_desc[texture_idx]
    width = desc[:, 0]
    height = desc[:, 1]
    offset = desc[:, 2]

    u = uv[..., 0] - jnp.floor(uv[..., 0])
    v = uv[..., 1] - jnp.floor(uv[..., 1])
    j = (u * width.astype(jnp.float32)).astype(jnp.int32)
    i = (v * height.astype(jnp.float32)).astype(jnp.int32)
    # The u32 casts in WGSL can land exactly on width/height when u == 1.0;
    # clamp like the hardware's out-of-bounds behavior would.
    j = jnp.clip(j, 0, width - 1)
    i = jnp.clip(i, 0, height - 1)

    bgra = scene.texels[offset + i * width + j]
    srgb = (
        jnp.stack(
            [
                (bgra >> jnp.uint32(16)) & jnp.uint32(0xFF),
                (bgra >> jnp.uint32(8)) & jnp.uint32(0xFF),
                bgra & jnp.uint32(0xFF),
            ],
            axis=-1,
        ).astype(jnp.float32)
        / jnp.float32(255.0)
    )
    return jnp.power(srgb, jnp.float32(2.2))
