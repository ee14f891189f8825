"""Procedural test scenes.

Sponza.glb is not shipped with the reference checkout (assets/README.md lists
it, but only Duck.glb is present), so large-scene benchmarks use a procedural
courtyard with Sponza-like structure: a floor, four walls, two rows of
columns, and scattered boxes — real occlusion, many triangles via quad
subdivision, and several distinct base-color materials.
"""

from __future__ import annotations

import numpy as np

from .flatten import FlattenedScene
from .texture import Texture


def _subdivided_quad(corner, edge_u, edge_v, subdiv: int) -> np.ndarray:
    """(2*subdiv^2, 3, 3) triangles tiling the parallelogram
    corner + s*edge_u + t*edge_v, CCW so cross(e1, e2) faces +normal."""
    s = np.linspace(0.0, 1.0, subdiv + 1, dtype=np.float32)
    grid = (
        np.asarray(corner, np.float32)
        + s[:, None, None] * np.asarray(edge_u, np.float32)
        + s[None, :, None] * np.asarray(edge_v, np.float32)
    )  # (subdiv+1, subdiv+1, 3)
    p00 = grid[:-1, :-1].reshape(-1, 3)
    p10 = grid[1:, :-1].reshape(-1, 3)
    p01 = grid[:-1, 1:].reshape(-1, 3)
    p11 = grid[1:, 1:].reshape(-1, 3)
    t1 = np.stack([p00, p10, p11], axis=1)
    t2 = np.stack([p00, p11, p01], axis=1)
    return np.concatenate([t1, t2], axis=0)


def _box(center, half, subdiv: int) -> np.ndarray:
    cx, cy, cz = center
    hx, hy, hz = half
    quads = [
        # +y (top), -y (bottom)
        ([cx - hx, cy + hy, cz - hz], [2 * hx, 0, 0], [0, 0, 2 * hz]),
        ([cx - hx, cy - hy, cz - hz], [0, 0, 2 * hz], [2 * hx, 0, 0]),
        # +x, -x
        ([cx + hx, cy - hy, cz - hz], [0, 2 * hy, 0], [0, 0, 2 * hz]),
        ([cx - hx, cy - hy, cz - hz], [0, 0, 2 * hz], [0, 2 * hy, 0]),
        # +z, -z
        ([cx - hx, cy - hy, cz + hz], [2 * hx, 0, 0], [0, 2 * hy, 0]),
        ([cx - hx, cy - hy, cz - hz], [0, 2 * hy, 0], [2 * hx, 0, 0]),
    ]
    return np.concatenate(
        [_subdivided_quad(c, u, v, subdiv) for c, u, v in quads], axis=0
    )


def courtyard_scene(subdiv: int = 8, textured: bool = False):
    """Build (FlattenedScene, textures). Triangle count scales ~ subdiv^2:
    subdiv=8 → ~25K tris, subdiv=26 → ~262K tris (Sponza-sized).
    textured=True swaps the solid 1x1 base colors for procedural 256x256
    checker/brick textures (Sponza-class texture-gather load)."""
    chunks: list[np.ndarray] = []
    materials: list[int] = []

    def add(tris: np.ndarray, material: int) -> None:
        chunks.append(tris.astype(np.float32))
        materials.extend([material] * tris.shape[0])

    # Floor 40x20, walls height 12 (interior-facing normals).
    add(_subdivided_quad([-20, 0, -10], [0, 0, 20], [40, 0, 0], 2 * subdiv), 0)
    add(_subdivided_quad([-20, 0, -10], [40, 0, 0], [0, 12, 0], subdiv), 1)  # -z wall
    add(_subdivided_quad([-20, 0, 10], [0, 12, 0], [40, 0, 0], subdiv), 1)  # +z wall
    add(_subdivided_quad([-20, 0, -10], [0, 12, 0], [0, 0, 20], subdiv), 1)  # -x wall
    add(_subdivided_quad([20, 0, -10], [0, 0, 20], [0, 12, 0], subdiv), 1)  # +x wall

    # Two rows of columns.
    rng = np.random.default_rng(42)
    for x in np.linspace(-16, 16, 9):
        for z in (-5.0, 5.0):
            add(_box([x, 4.0, z], [0.6, 4.0, 0.6], subdiv), 2)
    # Scattered crates.
    for _ in range(12):
        cx = rng.uniform(-17, 17)
        cz = rng.uniform(-8, 8)
        h = rng.uniform(0.5, 1.5)
        add(_box([cx, h, cz], [h, h, h], subdiv), 3)

    positions = np.concatenate(chunks, axis=0)
    num_tris = positions.shape[0]

    e1 = positions[:, 1] - positions[:, 0]
    e2 = positions[:, 2] - positions[:, 0]
    n = np.cross(e1, e2)
    n /= np.maximum(np.linalg.norm(n, axis=-1, keepdims=True), 1e-12)
    normals = np.repeat(n[:, None, :], 3, axis=1).astype(np.float32)

    # Planar UVs from the two dominant axes of each triangle's bbox.
    uvs = positions[:, :, :2].copy()
    uvs -= uvs.min(axis=(0, 1))
    uvs /= max(uvs.max(), 1.0)
    if textured:
        # ~1 texture repeat per 5 world units (fract-wrapped at lookup,
        # like the reference's UV handling) so the checker/brick patterns
        # read at courtyard scale.
        uvs *= 8.0

    flat = FlattenedScene(
        positions=positions,
        normals=normals,
        tex_coords=uvs.astype(np.float32),
        texture_indices=np.asarray(materials, dtype=np.uint32),
    )
    if textured:
        textures = [
            _checker_texture(256, (0.72, 0.66, 0.58), (0.5, 0.46, 0.42), 16),
            _brick_texture(256, (0.78, 0.74, 0.7), (0.6, 0.57, 0.54)),
            _brick_texture(128, (0.84, 0.82, 0.74), (0.7, 0.68, 0.6)),
            _checker_texture(128, (0.6, 0.38, 0.2), (0.44, 0.27, 0.14), 8),
        ]
    else:
        textures = [
            Texture.from_pixel(0.65, 0.6, 0.55, 1.0),  # floor
            Texture.from_pixel(0.75, 0.72, 0.68, 1.0),  # walls
            Texture.from_pixel(0.8, 0.78, 0.7, 1.0),  # columns
            Texture.from_pixel(0.55, 0.35, 0.2, 1.0),  # crates
        ]
    return flat, textures


def _pack_bgra(rgb: np.ndarray) -> "Texture":
    """(h, w, 3) float [0,1] -> BGRA u32 Texture."""
    u8 = np.clip(rgb * 255.0 + 0.5, 0, 255).astype(np.uint32)
    bgra = (u8[..., 2] | (u8[..., 1] << np.uint32(8))
            | (u8[..., 0] << np.uint32(16)) | np.uint32(255 << 24))
    h, w = rgb.shape[:2]
    return Texture(bgra.reshape(-1).astype(np.uint32), width=w, height=h)


def _checker_texture(size: int, a, b, cells: int) -> "Texture":
    yy, xx = np.meshgrid(np.arange(size), np.arange(size), indexing="ij")
    mask = ((yy * cells // size) + (xx * cells // size)) % 2
    rgb = np.where(mask[..., None] == 0, np.asarray(a), np.asarray(b))
    return _pack_bgra(rgb.astype(np.float64))


def _brick_texture(size: int, brick, mortar) -> "Texture":
    yy, xx = np.meshgrid(np.arange(size), np.arange(size), indexing="ij")
    rows = yy * 8 // size
    xoff = (xx + (rows % 2) * (size // 8)) % size
    in_mortar = ((yy * 8 % size) < size // 16) | ((xoff * 4 % size) < size // 16)
    rgb = np.where(in_mortar[..., None], np.asarray(mortar), np.asarray(brick))
    return _pack_bgra(rgb.astype(np.float64))
