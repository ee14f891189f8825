"""Courtyard sanity render after walk-kernel changes: 254K tris, 720p, few
spp, pallas engine. Writes /tmp/courtyard_sanity.png; check it shows the
interior courtyard (columns, crates, sunlit floor) without black/NaN tiles.
"""

import os
import pathlib
import sys

sys.path.insert(0, "/root/repo")

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
pathlib.Path(os.environ["JAX_COMPILATION_CACHE_DIR"]).mkdir(parents=True, exist_ok=True)

import numpy as np

from rayfinder_tpu.render.camera import create_camera
from rayfinder_tpu.render.pathtracer import SamplingParams, render_image_tiled
from rayfinder_tpu.render.scene import build_device_scene
from rayfinder_tpu.scene.procedural import courtyard_scene
from rayfinder_tpu.sky.model import sky_state_from_ui
from rayfinder_tpu.utils.image import write_png

W, H = 1280, 720
flat, textures = courtyard_scene(26)
print("tris:", flat.positions.shape[0])
scene = build_device_scene(flat, textures=textures)
camera = create_camera([-16.0, 5.0, 0.0], [12.0, 2.0, 0.0], 0.0, 1.0, 70.0, W / H)
sky = sky_state_from_ui(2.5, (0.3, 0.3, 0.3), 35.0, 25.0)

img = render_image_tiled(
    scene, sky, camera, width=W, height=H,
    sampling=SamplingParams(4, 4), exposure=0.25,
    samples_per_dispatch=4,
)
assert np.isfinite(img).all(), "non-finite pixels"
print("mean luminance:", float(img.mean()))
write_png("/tmp/courtyard_sanity.png", img)
print("wrote /tmp/courtyard_sanity.png")
