"""PNG I/O and image-comparison helpers for the CLI tools and golden tests."""

from __future__ import annotations

import pathlib

import numpy as np


def write_png(path, image: np.ndarray) -> None:
    """Write (H, W, 3|4) uint8 or float [0,1] image to PNG."""
    from PIL import Image

    image = np.asarray(image)
    if image.dtype != np.uint8:
        image = (np.clip(image, 0.0, 1.0) * 255.0).astype(np.uint8)
    Image.fromarray(image).save(pathlib.Path(path))


def read_png(path) -> np.ndarray:
    from PIL import Image

    return np.asarray(Image.open(pathlib.Path(path)))


def rmse(a: np.ndarray, b: np.ndarray) -> float:
    """Root-mean-square error over all channels, inputs in [0, 1]."""
    a = np.asarray(a, dtype=np.float64)
    b = np.asarray(b, dtype=np.float64)
    assert a.shape == b.shape, (a.shape, b.shape)
    return float(np.sqrt(np.mean((a - b) ** 2)))
