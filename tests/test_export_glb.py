"""Courtyard -> GLB -> gltf loader -> .pt -> device scene: the production
asset path carrying the procedural benchmark geometry (VERDICT r3 #5)."""

import numpy as np
import pytest

from rayfinder_tpu.io import PtScene, read_pt, write_pt
from rayfinder_tpu.scene.procedural import courtyard_scene
from rayfinder_tpu.tools.export_glb import export_flattened_glb


@pytest.fixture(scope="module")
def court_glb(tmp_path_factory):
    flat, textures = courtyard_scene(3, textured=True)  # small but multi-tex
    path = tmp_path_factory.mktemp("glb") / "court.glb"
    export_flattened_glb(flat, textures, path)
    return flat, textures, path


def test_geometry_round_trips(court_glb):
    flat, textures, path = court_glb
    from rayfinder_tpu.scene.gltf import load_gltf
    from rayfinder_tpu.scene.flatten import FlattenedScene

    loaded = FlattenedScene.from_scene(load_gltf(path))
    assert loaded.num_triangles == flat.num_triangles
    # The loader sorts meshes by texture; compare as sorted triangle sets.
    def canon(f):
        key = np.round(f.positions.reshape(f.num_triangles, -1), 5)
        order = np.lexsort(key.T)
        return key[order], np.asarray(f.texture_indices)[order]

    pk, pt_tex = canon(flat)
    lk, l_tex = canon(loaded)
    np.testing.assert_allclose(lk, pk, atol=1e-4)

    # Every texture with geometry survives with identical pixels.
    used = sorted(set(int(t) for t in flat.texture_indices))
    scene = load_gltf(path)
    assert len(scene.base_color_textures) == len(used)
    for li, ti in enumerate(used):
        a, b = scene.base_color_textures[li], textures[ti]
        assert (a.width, a.height) == (b.width, b.height)
        np.testing.assert_array_equal(a.pixels, b.pixels)


def test_pt_pipeline_renders(court_glb, tmp_path):
    """GLB -> PtScene -> .pt bytes -> read -> DeviceScene -> a short render:
    the full reference flow (pt-format-tool -> pt) on courtyard geometry."""
    import jax.numpy as jnp

    _, _, path = court_glb
    scene = PtScene.from_gltf(path)
    pt_path = tmp_path / "court.pt"
    write_pt(scene, pt_path)
    device = read_pt(pt_path).to_device_scene()

    from rayfinder_tpu.render.camera import create_camera
    from rayfinder_tpu.render.pathtracer import render_image, SamplingParams
    from rayfinder_tpu.sky.model import sky_state_from_ui

    camera = create_camera([-16.0, 5.0, 0.0], [12.0, 2.0, 0.0], 0.0, 1.0,
                           70.0, 64 / 48)
    sky = sky_state_from_ui(2.5, (0.3, 0.3, 0.3), 35.0, 25.0)
    img = render_image(device, sky, camera, width=64, height=48,
                       sampling=SamplingParams(2, 2), exposure=1.0)
    arr = np.asarray(img)
    assert np.isfinite(arr).all()
    assert arr.std() > 0.01  # actual geometry on screen, not a blank frame
