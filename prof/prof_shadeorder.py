"""Does hit-tri ORDER change the XLA shade cost? The tri-sorted body runs
the shade on lanes sorted by the tri it gathers attributes/texels for; the
post-shade-sort bodies (SORT_KEY=cull/dir) run it on effectively shuffled
tri rows. Row-count-bound lore says order shouldn't matter — measure it at
bench width (262144 lanes, courtyard tables).
"""
import sys; sys.path.insert(0, "/root/repo")
import os, time
import numpy as np
import jax, jax.numpy as jnp

from rayfinder_tpu.render.camera import create_camera, generate_camera_ray_lens
from rayfinder_tpu.render.scene import build_device_scene
from rayfinder_tpu.render.rng import blue_noise_tile
from rayfinder_tpu.render.tiling import block_order
from rayfinder_tpu.sky.model import sky_state_from_ui
from rayfinder_tpu.render.pathtracer import _nee_and_continuation
from rayfinder_tpu.scene.procedural import courtyard_scene

W = H = 512
B = W * H
REPS = int(os.environ.get("REPS", "20"))
flat, textures = courtyard_scene(26, textured=True)
scene = build_device_scene(flat, textures=textures)
camera = create_camera([-16.0, 5.0, 0.0], [12.0, 2.0, 0.0], 0.0, 1.0, 70.0, W / H)
sky = sky_state_from_ui(2.5, (0.3, 0.3, 0.3), 35.0, 25.0)
tile = jnp.asarray(blue_noise_tile())
fence = jax.jit(lambda a: jnp.sum(a))
sun_dir = jnp.asarray(sky.sun_direction)
solar_radiance = jnp.asarray(sky.solar_radiances)
park = jnp.asarray([1e30, 1e30, 1e30], jnp.float32)

ys_np, xs_np, _ = block_order(W, H)
ys, xs = jnp.asarray(ys_np), jnp.asarray(xs_np)
u = (xs.astype(jnp.float32) + 0.5) / W
v_tex = (ys.astype(jnp.float32) + 0.5) / H
nb = tile[ys % 128, xs % 128]
inv_dims = jnp.float32(1.0) / jnp.asarray([W, H], jnp.float32)
o0, d0 = generate_camera_ray_lens(
    camera, nb, u + nb[:, 0] * inv_dims[0],
    (1.0 - v_tex) + nb[:, 1] * inv_dims[1])

NT = scene.tri_attrs.shape[0]
rng = np.random.default_rng(3)
tri_sorted = jnp.asarray(np.sort(rng.integers(0, NT, B)).astype(np.int32))
tri_shuf = jnp.asarray(rng.permutation(np.asarray(tri_sorted)))


@jax.jit
def shade(tri, o, d):
    def step(c, _):
        o_, d_ = c
        thr = jnp.ones((B, 3), jnp.float32)
        live = jnp.ones((B,), bool)
        bounce = jnp.ones((B,), jnp.int32)
        (flag, o2, d2, thr2, b2, sh_o, sh_d, contrib) = _nee_and_continuation(
            scene, nb, o_, d_, tri, thr, bounce, live,
            sun_dir, solar_radiance, park, 4)
        return (o2, d2 + o2 * 1e-9), None
    c, _ = jax.lax.scan(step, (o, d), None, length=REPS)
    return c[0]


def timed(name, tri):
    r = shade(tri, o0, d0); float(fence(r))
    t0 = time.time()
    r = shade(tri, o0, d0); float(fence(r))
    dt = (time.time() - t0) / REPS * 1e3
    print(f"{name:8s} {dt:8.3f} ms/iter", flush=True)


timed("sorted", tri_sorted)
timed("shuffled", tri_shuf)
