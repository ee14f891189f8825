"""CLI: render a grayscale BVH node-visit heatmap for primary rays.

Parity with the reference's bvh-visualizer (src/bvh-visualizer/main.cpp:22-88):
auto-frames a camera from the root AABB, casts one primary ray per pixel,
and writes min(0.01 * nodesVisited, 1) as an 8-bit grayscale PNG. The ray
grid and camera framing match the CPU tool exactly so images diff directly.
"""

from __future__ import annotations

import argparse
import pathlib
import sys

import numpy as np


def visualize(gltf_path, width: int = 1280, height: int = 720) -> np.ndarray:
    import jax.numpy as jnp

    from ..render.camera import create_camera, generate_camera_ray
    from ..render.scene import load_device_scene
    from ..render.traverse import intersect_closest

    scene = load_device_scene(gltf_path)

    root_lo = np.asarray(scene.bvh_aabb_min[0])
    root_hi = np.asarray(scene.bvh_aabb_max[0])
    diag = root_hi - root_lo
    centroid = 0.5 * (root_lo + root_hi)
    # maxDimension tie-breaking (aabb.hpp:33-48)
    if diag[0] > diag[1] and diag[0] > diag[2]:
        max_dim = 0
    elif diag[1] > diag[2]:
        max_dim = 1
    else:
        max_dim = 2
    # main.cpp:46-55: origin = centroid - (-0.8*d, 0, 0.8*d)
    origin = centroid - np.asarray(
        [-0.8 * diag[max_dim], 0.0, 0.8 * diag[max_dim]], dtype=np.float32
    )
    camera = create_camera(origin, centroid, 0.0, 1.0, 70.0, width / height)

    js, is_ = np.meshgrid(np.arange(width), np.arange(height), indexing="xy")
    u = js.reshape(-1).astype(np.float32) / np.float32(width)
    v = 1.0 - (is_.reshape(-1) + 1.0).astype(np.float32) / np.float32(height)
    o, d = generate_camera_ray(camera, u, v)

    t_max = jnp.float32(np.finfo(np.float32).max)
    _, _, _, visited = intersect_closest(scene, o, d, t_max)
    x = np.minimum(0.01 * np.asarray(visited, dtype=np.float32), 1.0)
    gray = (x * 255.0).astype(np.uint8).reshape(height, width)
    return np.stack([gray, gray, gray], axis=-1)


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("gltf", type=pathlib.Path)
    parser.add_argument("-o", "--output", type=pathlib.Path, default=pathlib.Path("bvh-visualizer.png"))
    parser.add_argument("--width", type=int, default=1280)
    parser.add_argument("--height", type=int, default=720)
    args = parser.parse_args(argv)

    from ..utils.image import write_png

    img = visualize(args.gltf, args.width, args.height)
    write_png(args.output, img)
    print(f"wrote {args.output}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
