"""Wavefront path tracer: the TPU-native rebuild of the reference's WGSL
megakernel `rayColor` (src/pt/reference_path_tracer.wgsl:180-234).

Per sample and pixel, with a single 2D blue-noise value reused for every
sampling decision that frame (exactly like the reference):

  primary ray (thin lens) → for each bounce:
    closest hit → albedo lookup → next-event estimation against the solar
    disk (cone sample, Lambertian brdf, shadow ray, constant solar radiance,
    inverse cone PDF) → cosine-weighted scatter;
  miss → analytic Hosek-Wilkie sky radiance (sun NOT added here; it only
  contributes via NEE) and terminate.

The bounce loop is a statically unrolled masked loop over SoA ray batches —
rays that have terminated carry a dead mask instead of diverging, which is the
TPU-friendly formulation of the reference's per-thread `loop`/`break`.
"""

from __future__ import annotations

import os
from functools import partial
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from ..sky.model import SkyState, sky_radiance_dist
from .camera import Camera, generate_camera_ray_lens
from .intersect import T_MAX, offset_ray, ray_triangle
from .sampling import sample_cosine_hemisphere, sample_solar_disk_direction
from .scene import DeviceScene
from .texture_eval import eval_texture
from .traverse import intersect_any, intersect_closest

# wgsl:79-83
TERRESTRIAL_SOLAR_RADIUS = np.float32(0.255 * np.pi / 180.0)
SOLAR_COS_THETA_MAX = np.float32(np.cos(TERRESTRIAL_SOLAR_RADIUS))
SOLAR_INV_PDF = np.float32(2.0 * np.pi * (1.0 - SOLAR_COS_THETA_MAX))

FRAC_1_PI = np.float32(1.0 / np.pi)

# Scenes with more clusters than this re-sort bounce rays for tile coherence
# (see trace_radiance); env-overridable for tuning scans.
SORT_THRESHOLD = int(os.environ.get("RAYFINDER_SORT_THRESHOLD", "256"))
# Position bits per axis in the bounce-coherence sort key.
_SORT_BITS = int(os.environ.get("RAYFINDER_SORT_BITS", "5"))
# Regen compaction (accumulate_samples_regen): when the live-lane count falls
# below 1/DIV of the current batch, the busy lanes are compacted into a batch
# 1/DIV the size (repeatedly, down to FLOOR lanes). Measured on Duck 64spp:
# the while loop runs 220 iterations but only the first ~64 are full — the
# tail holds <9% live lanes yet costs the same per iteration as a full one.
# DIV=10 on the Duck bench gives phases [480000, 49152, 8192]: the
# tighter first compaction cuts dead rows in every phase-1 shade
# gather (live ~43K; benched 45.7 vs 44.2 at DIV=8's 61440 width).
_COMPACT_DIV = int(os.environ.get("RAYFINDER_COMPACT_DIV", "10"))
# Floor 4096 adds a narrower tail phase below the old 8192 (Duck phases
# become [480000, 49152, 8192, 4096]). TPU A/B 2026-08-19 (two runs each):
# 4096 = 52.05/51.90 Mrays/s, 8192 = 50.35-50.77, 2048 = 51.46/50.28 —
# the deep-bounce tail (118 iters x 0.79ms at 8192 wide) halves its width
# once more, but 2048 over-fragments (compaction cost + later phase exit).
_COMPACT_FLOOR = int(os.environ.get("RAYFINDER_COMPACT_FLOOR", "4096"))
# Ray-tile size for the FULL-WIDTH regen phase of small scenes (sync-bound
# in-kernel sky/regen rounds; the compacted phases use the divergence-tuned
# ops.pallas_walk defaults). See _accumulate_regen_fused.
_FULL_TILE = int(os.environ.get("RAYFINDER_FULL_TILE", "1024"))


def _phase_sizes(batch: int, floor: int) -> list[int]:
    """Regen phase lane counts: [batch, batch/DIV, ...] down to `floor`.
    Sizes are rounded up to a 2048-lane granularity (small floors — tests —
    shrink the granularity so multiple levels still exist).

    RAYFINDER_PHASES overrides the tail with an explicit comma-separated
    descending width list (perf experiments)."""
    override = os.environ.get("RAYFINDER_PHASES")
    if override:
        widths = [int(w) for w in override.replace(" ", "").split(",") if w]
        widths = [w for w in widths if 0 < w < batch]
        return [batch] + sorted(set(widths), reverse=True)
    gran = min(2048, max(floor, 16))
    cap = max(floor, -(-batch // _COMPACT_DIV // gran) * gran)
    if cap >= batch:
        return [batch]
    # Tail ladder below the first capture: divide the capture by 2/6/12
    # (Duck bench: [480000, 49152, 24576, 8192, 4096]). TPU A/B 2026-08-19,
    # two runs each: this ladder 53.23/53.17 Mrays/s vs 52.05/51.90 for the
    # old DIV-chain [49152, 8192, 4096] and 50.35-50.77 for [49152, 8192];
    # a denser ladder (+12288) measured 53.42/52.11 — within noise of this
    # one, not worth the extra compile/compaction. The live count lingers
    # in the 8K-49K band long enough that paying width there dominates.
    sizes = [batch, cap]
    for div in (2, 6, 12):
        nxt = max(floor, -(-cap // div // gran) * gran)
        if nxt >= sizes[-1]:
            continue
        sizes.append(nxt)
        if nxt <= floor:
            break
    return sizes


class SamplingParams(NamedTuple):
    """reference_path_tracer.hpp:26-32 defaults."""

    num_samples_per_pixel: int = 128
    num_bounces: int = 4


def get_engine(engine: str):
    """Resolve a traversal engine name to (closest, any_hit) callables.

    closest(scene, o, d, t_max) -> (hit, t, tri_idx, extra);
    any_hit(scene, o, d, t_max) -> occluded.
    """
    if engine in ("pallas", "pallas_split"):
        # "pallas_split" = identical kernels through the UNFUSED regen loop
        # (accumulate_lanes_regen's callback path instead of the persistent
        # fused kernel) — the A/B baseline for callback-loop engines
        # (measured -28% vs fused on the courtyard).
        from ..ops.pallas_walk import pallas_intersect_any, pallas_intersect_closest

        def closest(s, o, d, tm):
            hit, t, tri = pallas_intersect_closest(s, o, d, tm)
            return hit, t, tri, None

        return closest, pallas_intersect_any

    if engine == "wavefront":
        from .wavefront import intersect_any_wavefront, intersect_closest_wavefront

        def closest(s, o, d, tm):
            hit, t, tri, _ = intersect_closest_wavefront(s, o, d, tm)
            return hit, t, tri, None

        def any_hit(s, o, d, tm):
            occ, _ = intersect_any_wavefront(s, o, d, tm)
            return occ

        return closest, any_hit

    if engine == "reference":
        return intersect_closest, intersect_any

    raise ValueError(f"unknown traversal engine: {engine!r}")


def _surface_interaction(scene: DeviceScene, origin, direction, tri_idx):
    """Recover the reference's Intersection data for known hit triangles:
    offset hit point (geometric normal), interpolated shading normal, UV and
    texture index (wgsl:383-401, 477-521).

    One chunky (B, 25) row gather from the packed attribute table instead of
    four small gathers — TPU gathers are row-count bound, not byte bound.
    All consumers slice the gather FLAT, as (B, k) column windows: reshaping
    to (B, 3, 3) forces padded minor-dim relayouts that cost ~2x the whole
    computation (measured 5.0 -> 2.0 ms at 480K lanes on v5e)."""
    attrs = scene.tri_attrs[tri_idx]  # (B, 25)
    v0 = attrs[:, 0:3]
    v1 = attrs[:, 3:6]
    v2 = attrs[:, 6:9]
    _, t, u, v = ray_triangle(origin, direction, v0, v1, v2, jnp.float32(np.inf))

    e1 = v1 - v0
    e2 = v2 - v0
    b1 = u[:, None]
    b2 = v[:, None]
    p = v0 + b1 * e1 + b2 * e2
    geo_n = jnp.cross(e1, e2)
    geo_n = geo_n / jnp.linalg.norm(geo_n, axis=-1, keepdims=True)
    p_offset = offset_ray(p, geo_n)

    b0 = jnp.float32(1.0) - b1 - b2
    # Interpolated shading normal; NOT renormalized, matching wgsl:396.
    n = b0 * attrs[:, 9:12] + b1 * attrs[:, 12:15] + b2 * attrs[:, 15:18]
    uv = b0 * attrs[:, 18:20] + b1 * attrs[:, 20:22] + b2 * attrs[:, 22:24]
    tex = jax.lax.bitcast_convert_type(attrs[:, 24], jnp.int32)
    return p_offset, n, uv, tex, t


@partial(jax.jit, static_argnames=("num_bounces", "engine", "decorrelate"))
def trace_radiance(
    scene: DeviceScene,
    sky: SkyState,
    origin,
    direction,
    noise,
    num_bounces: int,
    engine: str = "wavefront",
    decorrelate: bool = False,
):
    """Radiance for a batch of primary rays (rayColor, wgsl:180-234).

    origin/direction: (B, 3); noise: (B, 2) reused across all decisions —
    exactly like the reference, which samples one blue-noise value per pixel
    per frame (wgsl:52). decorrelate=True rotates the noise by a per-bounce
    R2 offset instead (lower sample correlation at the cost of exact parity).
    engine: "reference" = lockstep per-ray stack traversal (traverse.py),
    "wavefront" = XLA cluster walk, "pallas" = Pallas cluster sweep.
    Returns (B, 3) float32 radiance.
    """
    closest, any_hit = get_engine(engine)

    batch = origin.shape[0]
    radiance = jnp.zeros((batch, 3), jnp.float32)
    throughput = jnp.ones((batch, 3), jnp.float32)
    alive = jnp.ones((batch,), jnp.bool_)

    sun_dir = jnp.asarray(sky.sun_direction)
    solar_radiance = jnp.asarray(sky.solar_radiances)

    # Terminated lanes get parked far outside every cluster AABB so their
    # tiles skip all traversal work (the engines prune whole supers when no
    # lane needs them) instead of re-tracing dead rays each bounce.
    park = jnp.asarray([1e30, 1e30, 1e30], jnp.float32)
    base_noise = noise

    # Bounce rays scatter in all directions, so a pixel-ordered tile overlaps
    # most of the scene and tile-level pruning collapses (observed 300x
    # slowdown on interior scenes). Re-sort lanes each bounce by (direction
    # octant, quantized position) to restore tile coherence; `pixel_of`
    # tracks the inverse so per-pixel radiance is exactly unchanged. Small
    # scenes (cluster count is a static shape) skip the sort: its ~40ms/bounce
    # overhead outweighs the savings when tiles already cover few clusters.
    sort_bounces = num_bounces > 1 and scene.cluster_tris.shape[0] > SORT_THRESHOLD
    pixel_of = jnp.arange(batch, dtype=jnp.int32)
    # Triangle bounds, not cluster bounds: padded super slots carry far-away
    # degenerate AABBs (bvh/clusters.super_pad_clusters) that would blow up
    # a cluster-table max.
    scene_lo = jnp.min(scene.tri_positions, axis=(0, 1))
    scene_inv = jnp.float32(1023.0) / jnp.maximum(
        jnp.max(scene.tri_positions, axis=(0, 1)) - scene_lo, 1e-6
    )

    def _coherence_key(o, d, live):
        octant = (
            (d[:, 0] < 0).astype(jnp.int32)
            + 2 * (d[:, 1] < 0).astype(jnp.int32)
            + 4 * (d[:, 2] < 0).astype(jnp.int32)
        )
        cell = jnp.clip(((o - scene_lo) * scene_inv), 0.0, 1023.0).astype(jnp.int32)
        # SORT_BITS bits per axis of position under the 3-bit octant:
        # coherent cones from coherent places sort together.
        b = _SORT_BITS
        sh = 10 - b
        pos_key = (cell[:, 0] >> sh << (2 * b)) | (cell[:, 1] >> sh << b) | (cell[:, 2] >> sh)
        key = (octant << (3 * b)) | pos_key
        return jnp.where(live, key, jnp.int32(2**30))

    for bounce in range(1, num_bounces + 1):
        if decorrelate and bounce > 1:
            # Rotate the pixel's noise point by the R2 sequence per bounce.
            shift = np.float32(0.7548776662466927) * bounce, np.float32(
                0.5698402909980532
            ) * bounce
            noise = base_noise + jnp.asarray(shift, jnp.float32)
            noise = noise - jnp.floor(noise)
        if bounce > 1:
            origin = jnp.where(alive[:, None], origin, park)
        if sort_bounces and bounce > 1:
            order = jnp.argsort(_coherence_key(origin, direction, alive))
            origin = origin[order]
            direction = direction[order]
            radiance = radiance[order]
            throughput = throughput[order]
            alive = alive[order]
            noise = noise[order]
            pixel_of = pixel_of[order]
        hit, _, tri_idx, _ = closest(scene, origin, direction, T_MAX)
        hit_lane = alive & hit
        miss_lane = alive & ~hit

        # --- miss: sky radiance (solar disk excluded; sun arrives via NEE) ---
        theta = jnp.arccos(jnp.clip(direction[:, 1], -1.0, 1.0))
        gamma = jnp.arccos(jnp.clip(jnp.sum(direction * sun_dir, axis=-1), -1.0, 1.0))
        sky_rgb = sky_radiance_dist(sky, theta, gamma)
        radiance = jnp.where(
            miss_lane[:, None], radiance + throughput * sky_rgb, radiance
        )

        # --- hit: NEE toward the solar disk (wgsl:191-203) ---
        safe_tri = jnp.maximum(tri_idx, 0)
        p, n, uv, tex, _ = _surface_interaction(scene, origin, direction, safe_tri)
        albedo = eval_texture(scene, tex, uv)

        light_dir = sample_solar_disk_direction(noise, SOLAR_COS_THETA_MAX, sun_dir)
        brdf = albedo * FRAC_1_PI
        # No clamp on the cosine — parity with wgsl:201.
        cos_term = jnp.sum(n * light_dir, axis=-1, keepdims=True)
        p_ok = jnp.all(jnp.isfinite(p), axis=-1)
        shadow_origin = jnp.where((hit_lane & p_ok)[:, None], p, park)
        occluded = any_hit(
            scene, shadow_origin, jnp.broadcast_to(light_dir, p.shape), T_MAX
        )
        visibility = jnp.where(occluded, jnp.float32(0.0), jnp.float32(1.0))[:, None]
        contrib = throughput * solar_radiance * brdf * cos_term * visibility * SOLAR_INV_PDF
        radiance = jnp.where(hit_lane[:, None], radiance + contrib, radiance)

        alive = hit_lane
        if bounce == num_bounces:
            break

        # --- scatter: implicit-PDF Lambertian (wgsl:209-211, 294-301) ---
        wi = sample_cosine_hemisphere(noise, n)
        # Degenerate shading normals (zero-length interpolation, onb poles)
        # can yield non-finite scatter directions; park those lanes instead
        # of feeding NaN/Inf rays to the traversal kernels.
        ray_ok = jnp.all(jnp.isfinite(wi), axis=-1) & jnp.all(jnp.isfinite(p), axis=-1)
        hit_lane = hit_lane & ray_ok
        origin = jnp.where(hit_lane[:, None], p, origin)
        direction = jnp.where(hit_lane[:, None], wi, direction)
        throughput = jnp.where(hit_lane[:, None], throughput * albedo, throughput)
        alive = hit_lane

    if sort_bounces:
        radiance = jnp.zeros_like(radiance).at[pixel_of].set(radiance)
    return radiance


@partial(
    jax.jit,
    static_argnames=("width", "height", "num_bounces", "spp", "engine"),
    donate_argnums=(5,),
)
def accumulate_sample(
    scene: DeviceScene,
    sky: SkyState,
    camera: Camera,
    blue_noise_tile,
    frame_idx,
    accum,
    *,
    width: int,
    height: int,
    num_bounces: int,
    spp: int,
    engine: str = "wavefront",
):
    """One progressive frame: add one sample per pixel into the accumulation
    buffer (fsMain, wgsl:34-64). Returns the updated (H*W, 3) buffer.

    Pixel mapping matches the reference's fullscreen pass: the fragment at
    image row i (top-left origin) uses v = 1 - (i + 0.5)/H flipped back, i.e.
    ray v = 1 - texCoord.y, plus the blue-noise sub-pixel jitter (wgsl:51-55).
    The buffer is in block-major pixel order (render/tiling.py).
    """
    from .tiling import block_order

    ys_np, xs_np, _ = block_order(width, height)
    ys = jnp.asarray(ys_np)
    xs = jnp.asarray(xs_np)

    from .rng import animated_blue_noise

    noise = animated_blue_noise(ys, xs, frame_idx, jnp.int32(spp), tile=blue_noise_tile)

    # Fragment texCoord.x = (x + 0.5) / W, texCoord.y = (y + 0.5) / H; the
    # WGSL uses u = texCoord.x and ray v = (1 - texCoord.y), each jittered by
    # noise / dimensions (wgsl:52-54).
    u = (xs.astype(jnp.float32) + 0.5) / jnp.float32(width)
    v_tex = (ys.astype(jnp.float32) + 0.5) / jnp.float32(height)
    jitter = noise / jnp.asarray([width, height], jnp.float32)
    ray_u = u + jitter[:, 0]
    ray_v = (jnp.float32(1.0) - v_tex) + jitter[:, 1]

    origin, direction = generate_camera_ray_lens(camera, noise, ray_u, ray_v)
    sample = trace_radiance(scene, sky, origin, direction, noise, num_bounces, engine)
    return accum + sample


@partial(
    jax.jit,
    static_argnames=("width", "height", "num_bounces", "spp", "num_frames", "engine"),
    donate_argnums=(5,),
)
def accumulate_samples(
    scene: DeviceScene,
    sky: SkyState,
    camera: Camera,
    blue_noise_tile,
    frame_base,
    accum,
    *,
    width: int,
    height: int,
    num_bounces: int,
    spp: int,
    num_frames: int,
    engine: str = "pallas",
):
    """Add `num_frames` progressive samples in one dispatch via lax.scan —
    the body compiles once and host round-trips are amortized (the axon
    tunnel costs ~27ms per dispatch).

    Rays, shading, and the accumulation buffer all live in BLOCK-MAJOR pixel
    order (render/tiling.py) so each 512-ray traversal tile covers a tight
    32x16 pixel block; unswizzle once when assembling the image."""
    from .rng import animated_blue_noise
    from .tiling import block_order

    ys_np, xs_np, _ = block_order(width, height)
    ys = jnp.asarray(ys_np)
    xs = jnp.asarray(xs_np)
    u = (xs.astype(jnp.float32) + 0.5) / jnp.float32(width)
    v_tex = (ys.astype(jnp.float32) + 0.5) / jnp.float32(height)

    def body(accum, k):
        frame_idx = frame_base + k
        noise = animated_blue_noise(ys, xs, frame_idx, jnp.int32(spp), tile=blue_noise_tile)
        jitter = noise / jnp.asarray([width, height], jnp.float32)
        ray_u = u + jitter[:, 0]
        ray_v = (jnp.float32(1.0) - v_tex) + jitter[:, 1]
        origin, direction = generate_camera_ray_lens(camera, noise, ray_u, ray_v)
        sample = trace_radiance(scene, sky, origin, direction, noise, num_bounces, engine)
        return accum + sample, None

    accum, _ = jax.lax.scan(body, accum, jnp.arange(num_frames, dtype=jnp.int32))
    return accum


@partial(
    jax.jit,
    static_argnames=(
        "width", "height", "num_bounces", "spp", "num_frames", "engine",
        "compact_floor", "count_rays",
    ),
    donate_argnums=(5,),
)
def accumulate_samples_regen(
    scene: DeviceScene,
    sky: SkyState,
    camera: Camera,
    blue_noise_tile,
    frame_base,
    accum,
    *,
    width: int,
    height: int,
    num_bounces: int,
    spp: int,
    num_frames: int,
    engine: str = "pallas",
    compact_floor: int | None = None,
    count_rays: bool = False,
):
    """accumulate_samples with PATH REGENERATION (persistent wavefront, after
    Laine et al. 2013): each lane owns one pixel and traces its `num_frames`
    samples back-to-back — the moment a path terminates (miss, depth, or
    degenerate scatter) the lane immediately starts its pixel's next sample.
    Traversal passes therefore run near full lane occupancy, instead of the
    scan formulation's mostly-dead deep-bounce passes (~85% of lanes die at
    bounce 1 on open scenes).

    Regeneration alone still runs the loop until the SLOWEST lane finishes:
    pixels on high-bounce geometry need ~num_bounces segments per sample while
    sky pixels need one, so after ~num_frames iterations the live fraction
    collapses (measured 8.9% on Duck) yet each tail iteration costs the same
    as a full one. So the loop is PHASED: when the live count drops below the
    next phase size, busy lanes are compacted (jnp.nonzero gather) into a
    batch 1/_COMPACT_DIV the size and the loop continues at that width,
    scatter-adding finished samples back to their pixels. Compaction keeps
    lanes in block-major pixel order, so traversal-tile coherence survives.

    Per-pixel arithmetic is bit-identical to accumulate_samples: the same
    noise stream per (pixel, frame), the same contribution order within a
    sample, and the same f32 accumulation grouping (each pixel's radiance
    starts from `accum` and adds one finished sample at a time, in sample
    order — compaction never reorders a single pixel's additions).
    """
    from .tiling import block_order

    ys_np, xs_np, _ = block_order(width, height)
    ys = jnp.asarray(ys_np)
    xs = jnp.asarray(xs_np)
    u = (xs.astype(jnp.float32) + 0.5) / jnp.float32(width)
    v_tex = (ys.astype(jnp.float32) + 0.5) / jnp.float32(height)

    # The blue-noise tile value is a pure function of the pixel: gather ONCE
    # per dispatch; per-sample noise is that base plus the frame's R2 offset
    # (arithmetic only) — no per-step gathers (rng.animated_blue_noise).
    th, tw = blue_noise_tile.shape[0], blue_noise_tile.shape[1]
    noise_base_full = blue_noise_tile[ys % th, xs % tw]  # (B, 2)

    inv_dims = jnp.float32(1.0) / jnp.asarray([width, height], jnp.float32)
    return accumulate_lanes_regen(
        scene, sky, camera, frame_base, accum, u, v_tex, noise_base_full,
        inv_dims, num_bounces=num_bounces, spp=spp, num_frames=num_frames,
        engine=engine, compact_floor=compact_floor, count_rays=count_rays,
    )


def accumulate_lanes_regen(
    scene: DeviceScene,
    sky: SkyState,
    camera: Camera,
    frame_base,
    accum,
    u,
    v_tex,
    noise_base_full,
    inv_dims,
    *,
    num_bounces: int,
    spp: int,
    num_frames: int,
    engine: str = "pallas",
    compact_floor: int | None = None,
    count_rays: bool = False,
):
    """Lane-level regen accumulation: the body of accumulate_samples_regen
    for an ARBITRARY set of lanes described by per-lane pixel data (u, v_tex,
    noise base). This is the shard-friendly entry — the multi-chip render
    step (parallel/sharding.py) calls it per pixel shard so every chip runs
    the same fused persistent-wavefront pipeline as a single chip.

    count_rays=True additionally returns an exact int32 [closest, shadow]
    ray-segment count (bench.py instrumentation; the reference counts rays
    the same way — one closest segment per bounce-loop iteration plus one
    NEE shadow ray per surface hit, reference_path_tracer.wgsl:180-234).
    Counting costs two scalar reductions per outer loop iteration."""
    closest, any_hit = get_engine(engine)
    from .rng import _A1, _A2

    batch = u.shape[0]
    nf = jnp.int32(num_frames)
    sun_dir = jnp.asarray(sky.sun_direction)
    solar_radiance = jnp.asarray(sky.solar_radiances)
    park = jnp.asarray([1e30, 1e30, 1e30], jnp.float32)

    def _noise_of(noise_base, sample_idx):
        n = ((frame_base + sample_idx) % jnp.int32(spp)).astype(jnp.float32)
        r2 = jnp.stack([_A1 * n, _A2 * n], axis=-1)
        r2 = r2 - jnp.floor(r2)
        out = noise_base + r2
        return out - jnp.floor(out)

    def _primary(u, v_tex, noise):
        jitter = noise * inv_dims
        ray_u = u + jitter[:, 0]
        ray_v = (jnp.float32(1.0) - v_tex) + jitter[:, 1]
        return generate_camera_ray_lens(camera, noise, ray_u, ray_v)

    if engine == "pallas":
        return _accumulate_regen_fused(
            scene, sky, camera, frame_base, accum,
            u=u, v_tex=v_tex, noise_base_full=noise_base_full,
            inv_dims=inv_dims, noise_of=_noise_of, primary=_primary,
            num_bounces=num_bounces, spp=spp, num_frames=num_frames,
            compact_floor=compact_floor, count_rays=count_rays,
        )

    def make_phase(u, v_tex, noise_base, pix):
        """Loop body over lanes with per-lane pixel data (u, v_tex,
        noise_base). pix None: lane == pixel, lrad is lane-aligned. pix given:
        compacted lanes, lrad stays full-size and finished samples scatter-add
        to their pixel (out-of-range pix rows — padding — are dropped)."""

        def noise_of(sample_idx):
            return _noise_of(noise_base, sample_idx)

        def primary(noise):
            return _primary(u, v_tex, noise)

        def body(st):
            if count_rays:
                *st, cnt = st
            sample, bounce, origin, direction, thr, srad, lrad, noise = st
            live = sample < nf
            origin = jnp.where(live[:, None], origin, park)

            hit, _, tri_idx, _ = closest(scene, origin, direction, T_MAX)
            hit_lane = live & hit
            miss_lane = live & ~hit
            if count_rays:
                # Each live lane traces one closest segment this iteration;
                # each hit lane one NEE shadow ray. Exact by construction.
                cnt = cnt + jnp.stack([
                    jnp.sum(live.astype(jnp.int32)),
                    jnp.sum(hit_lane.astype(jnp.int32)),
                ])

            # --- miss: sky radiance (sun excluded; it arrives via NEE) ---
            theta = jnp.arccos(jnp.clip(direction[:, 1], -1.0, 1.0))
            gamma = jnp.arccos(
                jnp.clip(jnp.sum(direction * sun_dir, axis=-1), -1.0, 1.0)
            )
            sky_rgb = sky_radiance_dist(sky, theta, gamma)
            srad = jnp.where(miss_lane[:, None], srad + thr * sky_rgb, srad)

            # --- hit: NEE toward the solar disk ---
            safe_tri = jnp.maximum(tri_idx, 0)
            p, n, uv, tex, _ = _surface_interaction(scene, origin, direction, safe_tri)
            albedo = eval_texture(scene, tex, uv)
            light_dir = sample_solar_disk_direction(noise, SOLAR_COS_THETA_MAX, sun_dir)
            brdf = albedo * FRAC_1_PI
            cos_term = jnp.sum(n * light_dir, axis=-1, keepdims=True)
            p_ok = jnp.all(jnp.isfinite(p), axis=-1)
            shadow_origin = jnp.where((hit_lane & p_ok)[:, None], p, park)
            occluded = any_hit(
                scene, shadow_origin, jnp.broadcast_to(light_dir, p.shape), T_MAX
            )
            visibility = jnp.where(occluded, jnp.float32(0.0), jnp.float32(1.0))[:, None]
            contrib = thr * solar_radiance * brdf * cos_term * visibility * SOLAR_INV_PDF
            srad = jnp.where(hit_lane[:, None], srad + contrib, srad)

            # --- scatter or terminate ---
            wi = sample_cosine_hemisphere(noise, n)
            ray_ok = jnp.all(jnp.isfinite(wi), axis=-1) & p_ok
            scatter = hit_lane & (bounce < jnp.int32(num_bounces)) & ray_ok
            term = live & ~scatter

            # Flush the finished sample into its pixel's radiance, in sample
            # order (same f32 add as the lane-aligned form: lrad[p] += srad).
            if pix is None:
                lrad = jnp.where(term[:, None], lrad + srad, lrad)
            else:
                lrad = lrad.at[pix].add(
                    jnp.where(term[:, None], srad, jnp.float32(0.0)), mode="drop"
                )
            srad = jnp.where(term[:, None], jnp.float32(0.0), srad)
            sample = jnp.where(term, sample + 1, sample)
            regen = term & (sample < nf)

            noise_new = noise_of(sample)
            po, pd = primary(noise_new)
            origin = jnp.where(
                scatter[:, None], p, jnp.where(regen[:, None], po, origin)
            )
            direction = jnp.where(
                scatter[:, None], wi, jnp.where(regen[:, None], pd, direction)
            )
            thr = jnp.where(
                scatter[:, None],
                thr * albedo,
                jnp.where(regen[:, None], jnp.float32(1.0), thr),
            )
            noise = jnp.where(regen[:, None], noise_new, noise)
            bounce = jnp.where(scatter, bounce + 1, jnp.where(regen, 1, bounce))
            out = (sample, bounce, origin, direction, thr, srad, lrad, noise)
            return out + (cnt,) if count_rays else out

        return body

    # Derive every while_loop carry from the (possibly shard_map-varying)
    # inputs so carry types match under manual sharding (same pattern as
    # render/traverse.py; adding exact zeros, numerics unchanged). u is
    # tiles-varying and frame_base samples-varying in the sharded step, so
    # the sum carries both axes.
    zero_i = (u[:batch] * 0.0).astype(jnp.int32) + jnp.asarray(
        frame_base, jnp.int32
    ) * jnp.int32(0)
    sample0 = jnp.zeros((batch,), jnp.int32) + zero_i
    body = make_phase(u, v_tex, noise_base_full, None)
    noise0 = _noise_of(noise_base_full, sample0)
    o0, d0 = _primary(u, v_tex, noise0)
    state = (
        sample0,  # per-lane sample index
        jnp.ones((batch,), jnp.int32) + zero_i,  # bounce depth of the active path
        o0,
        d0,
        jnp.ones((batch, 3), jnp.float32) + zero_i[:, None].astype(jnp.float32),
        jnp.zeros((batch, 3), jnp.float32) + zero_i[:, None].astype(jnp.float32),
        accum + zero_i[: accum.shape[0], None].astype(jnp.float32),
        noise0,
    )
    if count_rays:
        state = state + (jnp.zeros((2,), jnp.int32) + zero_i[:2],)

    floor = _COMPACT_FLOOR if compact_floor is None else compact_floor
    cur_u, cur_v, cur_nb, pix = u, v_tex, noise_base_full, None
    for size in _phase_sizes(batch, floor)[1:]:
        body_prev = body

        def above(st, size=size):
            return jnp.sum((st[0] < nf).astype(jnp.int32)) > jnp.int32(size)

        state = jax.lax.while_loop(above, body_prev, state)

        # Compact the busy lanes into a `size`-lane batch. nonzero preserves
        # block-major order, so spatial tile coherence survives compaction.
        if count_rays:
            *state, cnt = state
        sample, bounce, origin, direction, thr, srad, lrad, noise = state
        busy = sample < nf
        idx = jnp.nonzero(busy, size=size, fill_value=0)[0].astype(jnp.int32)
        valid = jnp.arange(size, dtype=jnp.int32) < jnp.sum(busy.astype(jnp.int32))
        ints = [sample, bounce] + ([pix] if pix is not None else [])
        (
            (origin, direction, thr, srad, noise, cur_u, cur_v, cur_nb),
            taken_i,
        ) = _take_packed(
            idx,
            [origin, direction, thr, srad, noise, cur_u, cur_v, cur_nb],
            ints,
        )
        sample, bounce = taken_i[0], taken_i[1]
        sample = jnp.where(valid, sample, nf)  # padding slots are dead
        pix = taken_i[2] if pix is not None else idx
        pix = jnp.where(valid, pix, jnp.int32(batch))  # out of range -> drop
        state = (
            sample, bounce, origin, direction, thr, srad, lrad, noise,
        )
        if count_rays:
            state = state + (cnt,)
        body = make_phase(cur_u, cur_v, cur_nb, pix)

    def any_left(st):
        return jnp.any(st[0] < nf)

    state = jax.lax.while_loop(any_left, body, state)
    if count_rays:
        return state[6], state[-1]
    return state[6]


# Per-iteration lane sorting in the fused regen loop (see
# _accumulate_regen_fused_sorted): "auto" enables it for big scenes only
# (cluster count > SORT_THRESHOLD), "1" forces it on, "0" off. Read at trace
# time; changing it requires a fresh jit cache entry (different shapes or a
# cleared cache).
def _regen_sort_enabled(scene) -> bool:
    mode = os.environ.get("RAYFINDER_REGEN_SORT", "auto")
    if mode == "auto":
        return scene.cluster_tris.shape[0] > SORT_THRESHOLD
    return mode == "1"


# In-kernel shading (ops/pallas_regen.pallas_trace_regen_shaded): "1" opts
# in for small flat scenes whose shade tables fit the VMEM budget. Default
# OFF: measured on the Duck bench (v5e, 2026-08-17) the in-kernel loop
# reaches 45.4 Mrays/s vs 49.4 for the split kernel + XLA shade — the
# per-round costs are sync-bound at 128-lane tiles for BOTH designs, the
# split path's XLA shade is already amortized inside its fused dispatch
# (~4.6us/tile-iter), and the in-kernel tail (222ms) loses to the split
# loop's compacted lockstep tail (90ms). Phase profile in
# prof/prof_inkernel.py. Kept as an engine option: the design wins where
# the XLA boundary is pricier (and is the template for a big-scene variant
# with windowed attribute DMAs).
def _inkernel_enabled(scene) -> bool:
    if os.environ.get("RAYFINDER_INKERNEL", "0") != "1":
        return False
    from ..ops.pallas_regen import inkernel_shade_ok

    small = scene.cluster_tris.shape[0] <= SORT_THRESHOLD
    return small and inkernel_shade_ok(scene)


def _accumulate_regen_inkernel(
    scene, sky, camera, frame_base, accum, *,
    u, v_tex, noise_base_full, inv_dims, noise_of, primary,
    num_bounces, spp, num_frames, compact_floor=None,
):
    """Hybrid accumulation around the in-kernel-shaded path kernel
    (ops/pallas_regen._make_shaded_path_kernel):

      * phase 0 — the split kernel at big sync-amortizing tiles plus ONE XLA
        shade, exactly like _accumulate_regen_fused's full-width phase: one
        call consumes every leading miss segment (the sky-dominated bulk,
        measured ~90% of Duck segments) at the tile size that phase wants
        (all-in-kernel at 128-lane tiles benched 25.7 vs 49.4 Mrays/s — the
        sky rounds are sync-bound and want 1024 lanes, but the shade's
        one-hot intermediates scale with lane count and blow VMEM there);
      * then the surviving lanes (hit-segment work) compact once and the
        SHADED kernel finishes every remaining sample in ONE dispatch at the
        divergence-tuned tile size — no more XLA shade steps, no per-segment
        kernel round-trips, no hit-lane idling (measured: the split loop
        spends 76 iterations x ~7ms here).

    Per-lane arithmetic order matches the split loop; the only deviations
    are FMA/fusion reassociation (tests budget it) and the same phase-end
    scatter-add regrouping the split path already has."""
    from ..ops.pallas_regen import pallas_trace_regen, pallas_trace_regen_shaded

    batch = u.shape[0]
    nf = jnp.int32(num_frames)
    spp_dyn = jnp.int32(spp)
    nb_dyn = jnp.int32(num_bounces)
    sun_dir = jnp.asarray(sky.sun_direction)
    solar_radiance = jnp.asarray(sky.solar_radiances)
    park = jnp.asarray([1e30, 1e30, 1e30], jnp.float32)
    z3 = jnp.zeros((batch, 3), jnp.float32)

    shade_tiles = None
    if os.environ.get("RAYFINDER_SHADE_TILE"):
        ft = int(os.environ["RAYFINDER_SHADE_TILE"])
        shade_tiles = (ft, max(1, 4096 // ft))

    sample0 = jnp.zeros((batch,), jnp.int32)
    noise0 = noise_of(noise_base_full, sample0)
    o0, d0 = primary(u, v_tex, noise0)
    state = (
        sample0,
        jnp.ones((batch,), jnp.int32),
        jnp.zeros((batch,), jnp.int32),
        o0,
        d0,
        jnp.ones((batch, 3), jnp.float32),
        z3,
        accum,  # lane == pixel in phase 0: exact accumulation grouping
        jnp.broadcast_to(park, (batch, 3)),
        jnp.broadcast_to(jnp.asarray([1.0, 0.0, 0.0], jnp.float32), (batch, 3)),
        z3,
    )

    floor = _COMPACT_FLOOR if compact_floor is None else compact_floor
    sizes = _phase_sizes(batch, floor)
    if len(sizes) < 2:
        # Tiny batches (tests): run everything in the shaded kernel.
        (sample, bounce, flag, origin, direction, thr, srad, lrad,
         sh_o, sh_d, contrib) = state
        out = pallas_trace_regen_shaded(
            scene, camera, sky, u, v_tex, noise_base_full, inv_dims,
            frame_base, spp_dyn, nf, nb_dyn, jnp.int32(0), T_MAX,
            sample, bounce, flag, origin, direction, thr, srad, lrad,
            sh_o, sh_d, contrib, tile_override=shade_tiles,
        )
        return out[7]

    # --- phase 0: split kernel + XLA shade until the live count fits the
    # first compaction level (one iteration in practice: the first call
    # consumes all leading misses and the survivors are the hit lanes).
    small_scene = scene.cluster_tris.shape[0] <= SORT_THRESHOLD
    ft = _FULL_TILE
    full_tiles = (ft, 4096 // ft) if (small_scene and batch >= 4096) else None

    def body(st):
        (sample, bounce, flag, origin, direction, thr, srad, lrad,
         sh_o, sh_d, contrib) = st
        (sample, bounce, origin, direction, thr, srad, lrad, _t, tri
         ) = pallas_trace_regen(
            scene, camera, sky, u, v_tex, noise_base_full, inv_dims,
            frame_base, spp_dyn, nf, T_MAX,
            sample, bounce, flag, origin, direction, thr, srad, lrad,
            sh_o, sh_d, contrib, tile_override=full_tiles,
        )
        live = sample < nf
        noise = noise_of(noise_base_full, sample)
        (flag, origin, direction, thr, bounce, sh_o, sh_d, contrib
         ) = _nee_and_continuation(
            scene, noise, origin, direction, tri, thr, bounce, live,
            sun_dir, solar_radiance, park, num_bounces,
        )
        return (sample, bounce, flag, origin, direction, thr, srad, lrad,
                sh_o, sh_d, contrib)

    size = sizes[1]

    def above(st):
        return jnp.sum((st[0] < nf).astype(jnp.int32)) > jnp.int32(size)

    state = jax.lax.while_loop(above, body, state)

    (sample, bounce, flag, origin, direction, thr, srad, lrad,
     sh_o, sh_d, contrib) = state
    lrad_full = lrad
    busy = sample < nf
    idx = jnp.nonzero(busy, size=size, fill_value=0)[0].astype(jnp.int32)
    valid = jnp.arange(size, dtype=jnp.int32) < jnp.sum(busy.astype(jnp.int32))
    pix = jnp.where(valid, idx, jnp.int32(batch))  # out of range -> drop
    (
        (origin, direction, thr, srad, sh_o, sh_d, contrib,
         cur_u, cur_v, cur_nb),
        (sample, bounce, flag),
    ) = _take_packed(
        idx,
        [origin, direction, thr, srad, sh_o, sh_d, contrib,
         u, v_tex, noise_base_full],
        [sample, bounce, flag],
    )
    state = (
        jnp.where(valid, sample, nf), bounce, flag,
        origin, direction, thr, srad,
        jnp.zeros((size, 3), jnp.float32),
        sh_o, sh_d, contrib,
    )

    # --- shaded phases: each call runs every tile down to a live floor
    # (the in-kernel analog of the split loop's phased compaction — a
    # floor of 0 would leave the deep-bounce tail spread across every
    # tile, each paying full-width rounds for a few live lanes), then the
    # survivors compact across tiles and re-enter. The last call drains
    # everything (floor 0).
    cur = size
    for nxt in sizes[2:]:
        per_tile_floor = max(0, nxt // max(1, cur // 128))
        state = pallas_trace_regen_shaded(
            scene, camera, sky, cur_u, cur_v, cur_nb,
            inv_dims, frame_base, spp_dyn, nf, nb_dyn,
            jnp.int32(per_tile_floor), T_MAX,
            *state, tile_override=shade_tiles,
        )
        (sample, bounce, flag, origin, direction, thr, srad, lrad,
         sh_o, sh_d, contrib) = state
        lrad_full = lrad_full.at[pix].add(lrad, mode="drop")
        busy = sample < nf
        idx = jnp.nonzero(busy, size=nxt, fill_value=0)[0].astype(jnp.int32)
        valid = jnp.arange(nxt, dtype=jnp.int32) < jnp.sum(
            busy.astype(jnp.int32)
        )
        (
            (origin, direction, thr, srad, sh_o, sh_d, contrib,
             cur_u, cur_v, cur_nb),
            (sample, bounce, flag, pix),
        ) = _take_packed(
            idx,
            [origin, direction, thr, srad, sh_o, sh_d, contrib,
             cur_u, cur_v, cur_nb],
            [sample, bounce, flag, pix],
        )
        pix = jnp.where(valid, pix, jnp.int32(batch))
        state = (
            jnp.where(valid, sample, nf), bounce, flag,
            origin, direction, thr, srad,
            jnp.zeros((nxt, 3), jnp.float32),
            sh_o, sh_d, contrib,
        )
        cur = nxt

    state = pallas_trace_regen_shaded(
        scene, camera, sky, cur_u, cur_v, cur_nb,
        inv_dims, frame_base, spp_dyn, nf, nb_dyn, jnp.int32(0), T_MAX,
        *state, tile_override=shade_tiles,
    )
    return lrad_full.at[pix].add(state[7], mode="drop")


def _take_packed(idx, float_arrs, int_arrs):
    """Compaction gather: pack every state column into ONE matrix and gather
    once. TPU gathers are row-count bound, not byte bound — the per-array
    form costs ~7.6 ms PER ARRAY at bench shapes (49152 rows from a 480K
    source, measured), so a phase compaction's ~14 takes were ~110 ms of
    pure gather; packed it is one. int arrays ride as bitcast f32 columns.

    Returns (floats, ints) with the input structures (1-D arrays stay 1-D).
    """
    cols = []
    fspec = []
    for a in float_arrs:
        a2 = a if a.ndim == 2 else a[:, None]
        fspec.append((a.ndim, a2.shape[1]))
        cols.append(a2)
    ispec = []
    for a in int_arrs:
        a2 = a if a.ndim == 2 else a[:, None]
        ispec.append((a.ndim, a2.shape[1]))
        cols.append(jax.lax.bitcast_convert_type(a2, jnp.float32))
    packed = jnp.concatenate(cols, axis=1)[idx]
    out_f, out_i = [], []
    base = 0
    for ndim, w in fspec:
        sl = packed[:, base:base + w]
        out_f.append(sl[:, 0] if ndim == 1 else sl)
        base += w
    for ndim, w in ispec:
        sl = jax.lax.bitcast_convert_type(packed[:, base:base + w], jnp.int32)
        out_i.append(sl[:, 0] if ndim == 1 else sl)
        base += w
    return out_f, out_i


def _nee_and_continuation(
    scene, noise, origin, direction, tri, thr, bounce, live,
    sun_dir, solar_radiance, park, num_bounces,
):
    """Shared XLA shade step of the fused regen loop: for lanes stopped at a
    surface hit, prepare the NEE light sample (shadow ray + unoccluded
    contribution) and the scatter continuation; the NEXT kernel call applies
    them. Returns (flag, origin, direction, thr, bounce, sh_o, sh_d,
    contrib)."""
    hit = live & (tri >= 0)
    safe_tri = jnp.maximum(tri, 0)
    p, n, uv, tex, _ = _surface_interaction(scene, origin, direction, safe_tri)
    albedo = eval_texture(scene, tex, uv)
    light_dir = sample_solar_disk_direction(noise, SOLAR_COS_THETA_MAX, sun_dir)
    brdf = albedo * FRAC_1_PI
    cos_term = jnp.sum(n * light_dir, axis=-1, keepdims=True)
    p_ok = jnp.all(jnp.isfinite(p), axis=-1)
    sh_o = jnp.where((hit & p_ok)[:, None], p, park)
    sh_d = jnp.broadcast_to(light_dir, p.shape)
    contrib = thr * solar_radiance * brdf * cos_term * SOLAR_INV_PDF
    contrib = jnp.where(hit[:, None], contrib, jnp.float32(0.0))

    wi = sample_cosine_hemisphere(noise, n)
    ray_ok = jnp.all(jnp.isfinite(wi), axis=-1) & p_ok
    scatter = hit & (bounce < jnp.int32(num_bounces)) & ray_ok
    # flag: 1 = NEE pending + scatter continuation; 2 = NEE pending +
    # terminate (the kernel flushes the sample and regenerates).
    flag = jnp.where(hit, jnp.where(scatter, 1, 2), 0).astype(jnp.int32)
    origin = jnp.where(scatter[:, None], p, origin)
    direction = jnp.where(scatter[:, None], wi, direction)
    thr = jnp.where(scatter[:, None], thr * albedo, thr)
    bounce = jnp.where(scatter, bounce + 1, bounce)
    return flag, origin, direction, thr, bounce, sh_o, sh_d, contrib


def _count_wrap(body, flag_index=2):
    """Wrap a fused-loop body with exact ray accounting. Every surface hit
    passes through the XLA shade exactly once (the kernel consumes miss
    segments on-chip and stops lanes only at surface hits), so summing the
    freshly set flag counts hits H exactly; flag==2 counts samples that
    terminate WITHOUT a miss segment (depth limit / degenerate scatter), D.
    Every sample terminates exactly once, so misses M = total_samples - D and
    closest segments = H + M, shadow rays = H. The counter rides the carry as
    a trailing (2,) int32 = [H, D]."""
    def body2(st):
        *inner, cnt = st
        out = body(tuple(inner))
        flag = out[flag_index]
        # flag==3 (budget-interrupted resume) is the SAME segment continued
        # across dispatches — not a new hit.
        hits = jnp.sum(((flag == 1) | (flag == 2)).astype(jnp.int32))
        depth = jnp.sum((flag == 2).astype(jnp.int32))
        return out + (cnt + jnp.stack([hits, depth]),)

    return body2


def _counts_to_rays(cnt, total_samples, num_bounces):
    """[H, D] -> [closest, shadow] (see _count_wrap). The int32 counters are
    bounded by total_samples * num_bounces (H) and total_samples (D);
    enforce the bound at trace time (total_samples is static) so an
    oversized single dispatch fails loudly instead of wrapping silently."""
    if total_samples * max(1, num_bounces) >= 2**31:
        raise ValueError(
            f"ray counters would overflow int32: {total_samples} samples x "
            f"{num_bounces} bounces in one dispatch; split across calls"
        )
    h, d = cnt[0], cnt[1]
    return jnp.stack([h + (jnp.int32(total_samples) - d), h])


def _accumulate_regen_fused(
    scene, sky, camera, frame_base, accum, *,
    u, v_tex, noise_base_full, inv_dims, noise_of, primary,
    num_bounces, spp, num_frames, compact_floor, count_rays=False,
):
    """Fused-path regeneration around the persistent path kernel
    (ops/pallas_regen.pallas_trace_regen).

    Division of labor per outer iteration:
      * kernel — resolves the previous segment's pending NEE light sample
        (occlusion sweep + contribution add), terminates depth-limited
        paths (sample flush + in-kernel primary regeneration), then traces
        every in-flight ray to its next hit, consuming ALL consecutive miss
        segments on-chip (sky evaluation + regeneration in-register);
      * XLA shade — surface interaction, texture, light/scatter sampling:
        the HBM gathers the kernel cannot do. It only PREPARES the NEE
        (shadow ray + unoccluded contribution) and the continuation ray;
        the next kernel call applies them, preserving the per-lane f32
        accumulation order of the unfused loop.

    On Duck ~90% of segments are misses, so this runs one outer iteration
    per HIT segment and zero extra dispatches. Phase compaction as in
    accumulate_samples_regen; compacted lanes accumulate into per-lane
    channels scatter-added to their pixels at phase END (per-termination
    scatters are impossible with in-kernel flushes) — a few-ulp regrouping
    budgeted by tests/test_pallas_regen.py.
    """
    from ..ops.pallas_regen import pallas_trace_regen
    from ..ops.pallas_walk import _grouped_mode

    if _regen_sort_enabled(scene):
        return _accumulate_regen_fused_sorted(
            scene, sky, camera, frame_base, accum,
            u=u, v_tex=v_tex, noise_base_full=noise_base_full,
            inv_dims=inv_dims, noise_of=noise_of, primary=primary,
            num_bounces=num_bounces, spp=spp, num_frames=num_frames,
            compact_floor=compact_floor, count_rays=count_rays,
        )

    segs = int(os.environ.get("RAYFINDER_SEGS", "1"))
    if segs > 1 and not _grouped_mode(scene.cluster_tris.shape[0]):
        return _accumulate_regen_fused_segs(
            scene, sky, camera, frame_base, accum,
            u=u, v_tex=v_tex, noise_base_full=noise_base_full,
            inv_dims=inv_dims, noise_of=noise_of, primary=primary,
            num_bounces=num_bounces, spp=spp, num_frames=num_frames,
            compact_floor=compact_floor, count_rays=count_rays, segs=segs,
        )

    # The opt-in in-kernel-shaded engine flushes whole paths on-chip, so the
    # exact segment counters below can't observe it; counting runs the split
    # kernel instead (the engines are sample-for-sample equivalent).
    if _inkernel_enabled(scene) and not count_rays:
        return _accumulate_regen_inkernel(
            scene, sky, camera, frame_base, accum,
            u=u, v_tex=v_tex, noise_base_full=noise_base_full,
            inv_dims=inv_dims, noise_of=noise_of, primary=primary,
            num_bounces=num_bounces, spp=spp, num_frames=num_frames,
            compact_floor=compact_floor,
        )

    batch = u.shape[0]
    nf = jnp.int32(num_frames)
    spp_dyn = jnp.int32(spp)
    sun_dir = jnp.asarray(sky.sun_direction)
    solar_radiance = jnp.asarray(sky.solar_radiances)
    park = jnp.asarray([1e30, 1e30, 1e30], jnp.float32)

    def make_body(u, v_tex, noise_base, tile_override=None):
        def body(st):
            (sample, bounce, flag, origin, direction, thr, srad, lrad,
             sh_o, sh_d, contrib) = st
            (sample, bounce, origin, direction, thr, srad, lrad, _t, tri
             ) = pallas_trace_regen(
                scene, camera, sky, u, v_tex, noise_base, inv_dims, frame_base,
                spp_dyn, nf, T_MAX,
                sample, bounce, flag, origin, direction, thr, srad, lrad,
                sh_o, sh_d, contrib,
                tile_override=tile_override,
            )
            # Every live lane is now stopped at a surface hit; prepare its
            # NEE and continuation (the next kernel call applies them).
            live = sample < nf
            noise = noise_of(noise_base, sample)
            (flag, origin, direction, thr, bounce, sh_o, sh_d, contrib
             ) = _nee_and_continuation(
                scene, noise, origin, direction, tri, thr, bounce, live,
                sun_dir, solar_radiance, park, num_bounces,
            )
            return (sample, bounce, flag, origin, direction, thr, srad, lrad,
                    sh_o, sh_d, contrib)

        return body

    sample0 = jnp.zeros((batch,), jnp.int32)
    noise0 = noise_of(noise_base_full, sample0)
    o0, d0 = primary(u, v_tex, noise0)
    z3 = jnp.zeros((batch, 3), jnp.float32)
    state = (
        sample0,
        jnp.ones((batch,), jnp.int32),
        jnp.zeros((batch,), jnp.int32),  # no pending NEE on entry
        o0,
        d0,
        jnp.ones((batch, 3), jnp.float32),
        z3,
        accum,  # phase 1: lane == pixel, exact accumulation grouping
        jnp.broadcast_to(park, (batch, 3)),
        jnp.broadcast_to(jnp.asarray([1.0, 0.0, 0.0], jnp.float32), (batch, 3)),
        z3,
    )
    # Full-width phase of SMALL (mostly-sky) scenes: big sync-amortizing
    # tiles (one 32x16 pixel block each); compacted phases below use the
    # divergence-tuned default (16x8 sub-blocks). Measured (Duck 64spp):
    # the full-width phase at 128-lane tiles costs 0.44s vs 0.21s at 512 —
    # its in-kernel sky/regen rounds are sync-bound, not divergent. Big
    # enclosed scenes stay divergence-bound at full width (courtyard at
    # 512-lane tiles loses 34%), so they keep the small tiles throughout.
    small_scene = scene.cluster_tris.shape[0] <= SORT_THRESHOLD
    ft = _FULL_TILE
    full_tiles = (ft, 4096 // ft) if (small_scene and batch >= 4096) else None
    body = make_body(u, v_tex, noise_base_full, tile_override=full_tiles)
    if count_rays:
        body = _count_wrap(body)
        state = state + (jnp.zeros((2,), jnp.int32),)

    floor = _COMPACT_FLOOR if compact_floor is None else compact_floor
    lrad_full = None
    cur_u, cur_v, cur_nb, pix = u, v_tex, noise_base_full, None
    for size in _phase_sizes(batch, floor)[1:]:
        def above(st, size=size):
            return jnp.sum((st[0] < nf).astype(jnp.int32)) > jnp.int32(size)

        state = jax.lax.while_loop(above, body, state)

        if count_rays:
            *state, cnt = state
        (sample, bounce, flag, origin, direction, thr, srad, lrad,
         sh_o, sh_d, contrib) = state
        # Flush lane radiance to pixels, then compact the busy lanes
        # (pending NEE state rides along and resolves in the next phase).
        if pix is None:
            lrad_full = lrad
        else:
            lrad_full = lrad_full.at[pix].add(lrad, mode="drop")
        busy = sample < nf
        idx = jnp.nonzero(busy, size=size, fill_value=0)[0].astype(jnp.int32)
        valid = jnp.arange(size, dtype=jnp.int32) < jnp.sum(busy.astype(jnp.int32))
        ints = [sample, bounce, flag] + ([pix] if pix is not None else [])
        (
            (origin, direction, thr, srad, sh_o, sh_d, contrib,
             cur_u, cur_v, cur_nb),
            taken_i,
        ) = _take_packed(
            idx,
            [origin, direction, thr, srad, sh_o, sh_d, contrib,
             cur_u, cur_v, cur_nb],
            ints,
        )
        sample, bounce, flag = taken_i[0], taken_i[1], taken_i[2]
        sample = jnp.where(valid, sample, nf)
        pix = taken_i[3] if pix is not None else idx
        pix = jnp.where(valid, pix, jnp.int32(batch))  # out of range -> drop
        state = (
            sample, bounce, flag, origin, direction,
            thr, srad, jnp.zeros((size, 3), jnp.float32),
            sh_o, sh_d, contrib,
        )
        body = make_body(cur_u, cur_v, cur_nb)
        if count_rays:
            state = state + (cnt,)
            body = _count_wrap(body)

    def any_left(st):
        return jnp.any(st[0] < nf)

    state = jax.lax.while_loop(any_left, body, state)
    lrad = state[7]
    out = lrad if pix is None else lrad_full.at[pix].add(lrad, mode="drop")
    if count_rays:
        return out, _counts_to_rays(state[-1], batch * num_frames, num_bounces)
    return out


def _accumulate_regen_fused_segs(
    scene, sky, camera, frame_base, accum, *,
    u, v_tex, noise_base_full, inv_dims, noise_of, primary,
    num_bounces, spp, num_frames, compact_floor, count_rays=False, segs=2,
):
    """Multi-hit-segment fused loop (VERDICT r4 #2, RAYFINDER_SEGS=K,
    flat-sweep scenes): each lane pipelines K independent paths of its
    pixel through the K-slot kernel (ops/pallas_regen._make_path_kernel_segs),
    so each outer iteration shades K hit segments per lane and the
    iteration count drops ~K-fold, with the kernel harvesting straggler
    idle time by tracing fresh samples on early-parked lanes. Per-sample
    radiance is bit-identical to the single-slot loop; only the f32 add
    order into each lane's accumulator changes (budgeted regrouping)."""
    from ..ops.pallas_regen import pallas_trace_regen_segs

    batch = u.shape[0]
    nf = jnp.int32(num_frames)
    spp_dyn = jnp.int32(spp)
    sun_dir = jnp.asarray(sky.sun_direction)
    solar_radiance = jnp.asarray(sky.solar_radiances)
    park = jnp.asarray([1e30, 1e30, 1e30], jnp.float32)

    def make_body(u, v_tex, noise_base, tile_override=None):
        def body(st):
            (busy, sal, scnt, sray, sthr, snee, lrad) = st[:7]
            sal, lrad, ocnt, oray, othr, _t = pallas_trace_regen_segs(
                scene, camera, sky, u, v_tex, noise_base, inv_dims,
                frame_base, spp_dyn, nf, T_MAX,
                sal, lrad, scnt, sray, sthr, snee,
                tile_override=tile_override, segs=segs,
            )
            cnt_cols, ray_cols, thr_cols, nee_cols = [], [], [], []
            hits = depth = jnp.int32(0)
            for j in range(segs):
                ssample = ocnt[:, 3 * j]
                bounce = ocnt[:, 3 * j + 1]
                tri = ocnt[:, 3 * j + 2]
                o = oray[:, 6 * j:6 * j + 3]
                d = oray[:, 6 * j + 3:6 * j + 6]
                thr = othr[:, 6 * j:6 * j + 3]
                srad = othr[:, 6 * j + 3:6 * j + 6]
                live = ssample < nf
                noise = noise_of(noise_base, ssample)
                (flag, o, d, thr, bounce, sh_o, sh_d, contrib
                 ) = _nee_and_continuation(
                    scene, noise, o, d, tri, thr, bounce, live,
                    sun_dir, solar_radiance, park, num_bounces,
                )
                cnt_cols += [ssample, bounce, flag]
                ray_cols += [o, d]
                thr_cols += [thr, srad]
                nee_cols += [sh_o, sh_d, contrib]
                if count_rays:
                    hits = hits + jnp.sum((flag > 0).astype(jnp.int32))
                    depth = depth + jnp.sum((flag == 2).astype(jnp.int32))
            scnt = jnp.stack(cnt_cols, axis=1)
            sray = jnp.concatenate(ray_cols, axis=1)
            sthr = jnp.concatenate(thr_cols, axis=1)
            snee = jnp.concatenate(nee_cols, axis=1)
            busy = scnt[:, 0]
            for j in range(1, segs):
                busy = jnp.minimum(busy, scnt[:, 3 * j])
            out = (busy, sal, scnt, sray, sthr, snee, lrad)
            if count_rays:
                out = out + (st[7] + jnp.stack([hits, depth]),)
            return out

        return body

    # Initial slots: samples 0..K-1 per lane (slot j dead when j >= nf).
    cnt_cols, ray_cols = [], []
    for j in range(segs):
        ssample0 = jnp.full((batch,), j, jnp.int32)
        noise0 = noise_of(noise_base_full, ssample0)
        o0, d0 = primary(u, v_tex, noise0)
        cnt_cols += [ssample0, jnp.ones((batch,), jnp.int32),
                     jnp.zeros((batch,), jnp.int32)]
        ray_cols += [o0, d0]
    z3 = jnp.zeros((batch, 3), jnp.float32)
    ones3 = jnp.ones((batch, 3), jnp.float32)
    scnt0 = jnp.stack(cnt_cols, axis=1)
    sray0 = jnp.concatenate(ray_cols, axis=1)
    sthr0 = jnp.concatenate([x for _ in range(segs) for x in (ones3, z3)],
                            axis=1)
    snee0 = jnp.concatenate(
        [x for _ in range(segs)
         for x in (jnp.broadcast_to(park, (batch, 3)),
                   jnp.broadcast_to(jnp.asarray([1.0, 0.0, 0.0], jnp.float32),
                                    (batch, 3)), z3)],
        axis=1)
    state = (
        jnp.zeros((batch,), jnp.int32),
        jnp.full((batch,), segs, jnp.int32),
        scnt0, sray0, sthr0, snee0, accum,
    )
    small_scene = scene.cluster_tris.shape[0] <= SORT_THRESHOLD
    ft = _FULL_TILE
    full_tiles = (ft, 4096 // ft) if (small_scene and batch >= 4096) else None
    body = make_body(u, v_tex, noise_base_full, tile_override=full_tiles)
    if count_rays:
        state = state + (jnp.zeros((2,), jnp.int32),)

    floor = _COMPACT_FLOOR if compact_floor is None else compact_floor
    lrad_full = None
    cur_u, cur_v, cur_nb, pix = u, v_tex, noise_base_full, None
    for size in _phase_sizes(batch, floor)[1:]:
        def above(st, size=size):
            return jnp.sum((st[0] < nf).astype(jnp.int32)) > jnp.int32(size)

        state = jax.lax.while_loop(above, body, state)

        if count_rays:
            *state, cnt = state
        (busy, sal, scnt, sray, sthr, snee, lrad) = state
        if pix is None:
            lrad_full = lrad
        else:
            lrad_full = lrad_full.at[pix].add(lrad, mode="drop")
        busy_mask = busy < nf
        idx = jnp.nonzero(busy_mask, size=size, fill_value=0)[0].astype(jnp.int32)
        valid = jnp.arange(size, dtype=jnp.int32) < jnp.sum(
            busy_mask.astype(jnp.int32))
        ints = [sal, scnt] + ([pix] if pix is not None else [])
        ((sray, sthr, snee, cur_u, cur_v, cur_nb), taken_i) = _take_packed(
            idx, [sray, sthr, snee, cur_u, cur_v, cur_nb], ints)
        sal, scnt = taken_i[0], taken_i[1]
        sal = jnp.where(valid, sal, nf)
        for j in range(segs):
            scnt = scnt.at[:, 3 * j].set(
                jnp.where(valid, scnt[:, 3 * j], nf))
        busy = scnt[:, 0]
        for j in range(1, segs):
            busy = jnp.minimum(busy, scnt[:, 3 * j])
        pix = taken_i[2] if pix is not None else idx
        pix = jnp.where(valid, pix, jnp.int32(batch))
        state = (busy, sal, scnt, sray, sthr, snee,
                 jnp.zeros((size, 3), jnp.float32))
        body = make_body(cur_u, cur_v, cur_nb)
        if count_rays:
            state = state + (cnt,)

    def any_left(st):
        return jnp.any(st[0] < nf)

    state = jax.lax.while_loop(any_left, body, state)
    lrad = state[6]
    out = lrad if pix is None else lrad_full.at[pix].add(lrad, mode="drop")
    if count_rays:
        return out, _counts_to_rays(state[-1], batch * num_frames, num_bounces)
    return out


def _accumulate_regen_fused_sorted(
    scene, sky, camera, frame_base, accum, *,
    u, v_tex, noise_base_full, inv_dims, noise_of, primary,
    num_bounces, spp, num_frames, compact_floor, count_rays=False,
):
    """_accumulate_regen_fused with PER-ITERATION LANE SORTING: after every
    kernel call the lanes are reordered by the hit-triangle index the kernel
    just returned (leaf order is the SAH builder's space-filling walk, so
    consecutive keys = spatially adjacent surface points). The next kernel
    call therefore sees ray tiles whose scatter origins share clusters,
    collapsing the block-uniform divergence penalty that dominates enclosed
    scenes (measured courtyard: a 128-lane tile tests a union of 43.5
    clusters when its lanes need only 1.68 each). Exhausted lanes sort to
    the tail, where fully-dead tiles early-exit the sweeps for free.

    The permutation cost is ONE argsort plus ONE row gather: the whole lane
    state is packed into a single (size, 23) matrix (TPU gathers are
    row-count bound, not byte bound — a 23-column gather costs the same as a
    3-column one). An earlier experiment that permuted 11 arrays separately
    lost 30% on Duck; the packed form removes that overhead.

    Because lanes migrate, every phase tracks a pixel map from the start
    (pix), and lane radiance scatter-adds to pixels at phase END — the same
    few-ulp f32 regrouping the unsorted path's compacted phases already
    have, here also applied to phase 1 (budgeted by tests; far inside the
    renderer's 1e-3 RMSE contract)."""
    from ..ops.pallas_regen import pallas_trace_regen

    batch = u.shape[0]
    nf = jnp.int32(num_frames)
    spp_dyn = jnp.int32(spp)
    sun_dir = jnp.asarray(sky.sun_direction)
    solar_radiance = jnp.asarray(sky.solar_radiances)
    park = jnp.asarray([1e30, 1e30, 1e30], jnp.float32)
    dead_key = jnp.int32(2**30)

    # Default "dir" measured on TPU (textured courtyard bench): 3.500/3.505/
    # 3.509 vs tri 3.443/3.447/3.326 (2026-08-21). A third mode — "cull",
    # sorting by a keycull kernel's approximate nearest-entered-group key —
    # was REMOVED after measuring 2.378: the group-entry approximation is
    # provably degenerate in enclosed scenes (every containing box's entry
    # clamps to 0 so the key carries no information; prof/probe_cull.py,
    # CLAUDE.md session 13), and every cheap exact-key approximation also
    # failed offline. Git history (e7e52f0) has the implementation.
    sort_key_mode = os.environ.get("RAYFINDER_SORT_KEY", "dir")
    if sort_key_mode not in ("tri", "dir"):
        # A typo'd mode silently falling back to "tri" would invalidate
        # A/B measurements (ADVICE r4).
        raise ValueError(
            f"RAYFINDER_SORT_KEY={sort_key_mode!r}: expected tri|dir")
    # Budget-capped sweeps (RAYFINDER_SWEEP_BUDGET, dir key only): lanes
    # whose traversal is interrupted at the visit budget return unresolved
    # with a (t, tri, done-bitmask) carry, sort into their own key band,
    # and resume (flag==3) next iteration in re-grouped coherent tiles —
    # instead of serializing their original tile-mates (diag: tile rounds
    # mean 10.7 / p95 21 vs per-lane need ~0.5 on bounce populations).
    from ..ops.pallas_walk import _SWEEP_BUDGET

    budget_on = _SWEEP_BUDGET > 0 and sort_key_mode == "dir"

    def _dir_bin_key(tri, direction, pix, live, unres=None):
        """Free arithmetic sort key: previous hit cluster x 96 direction
        bins (cube face x 4x4 grid). prof/study_sortkey2.py (dumped
        courtyard sets): bounce tile SUPER VISITS 18.66 -> 6.91 under this
        ordering — the production grouped sweep's per-lane selection makes
        visits (DMA + entry build + selection syncs, ~4us each) the cost
        that lane sorting moves, and this key needs no key kernel at all
        (the exact nearest-cluster key reaches 1.9 visits but costs
        ~17us/tile to compute — more than it saves at full width).
        Regenerating (miss-but-live) lanes group by pixel so fresh camera
        rays stay spatially coherent."""
        hit = tri >= 0
        hc = t2c[jnp.maximum(tri, 0)]
        # Branchless dominant-axis cube-map bins: take_along_axis on (B, 3)
        # lowers as a row-bound gather (~13ns/row: 3.4 ms EACH at bench
        # width) — elementwise where-chains are free.
        dx, dy, dz = direction[:, 0], direction[:, 1], direction[:, 2]
        adx, ady, adz = jnp.abs(dx), jnp.abs(dy), jnp.abs(dz)
        is_x = (adx >= ady) & (adx >= adz)
        is_y = ~is_x & (ady >= adz)
        m = jnp.maximum(jnp.maximum(adx, ady), adz)
        m = jnp.maximum(m, jnp.float32(1e-20))
        ds = jnp.where(is_x, dx, jnp.where(is_y, dy, dz))
        face = (jnp.where(is_x, 0, jnp.where(is_y, 2, 4))
                + (ds > 0).astype(jnp.int32))
        u_ = jnp.where(is_x, dy, jnp.where(is_y, dz, dx))
        v_ = jnp.where(is_x, dz, jnp.where(is_y, dx, dy))
        ub = jnp.clip(((u_ / m + 1.0) * 2.0).astype(jnp.int32), 0, 3)
        vb = jnp.clip(((v_ / m + 1.0) * 2.0).astype(jnp.int32), 0, 3)
        dbin = (face * 4 + ub) * 4 + vb
        key = hc * jnp.int32(96) + dbin
        key = jnp.where(hit, key, jnp.int32(2**28) + pix)
        if unres is not None:
            # Unresolved (budget-interrupted) lanes: their own band between
            # hit keys (< 2**20) and regenerating lanes (2**28) so they
            # re-group into coherent tiles; keyed by the partial-hit
            # cluster when one exists, else the direction bin.
            ukey = jnp.where(tri >= 0, hc * jnp.int32(96) + dbin, dbin)
            key = jnp.where(unres == 1, jnp.int32(2**26) + ukey, key)
        return jnp.where(live, key, dead_key)

    if sort_key_mode == "dir":
        # tri -> cluster inverse of cluster_tri_map; loop-invariant, built
        # once per accumulate call (XLA hoists it out of the while_loops).
        cl_map = scene.cluster_tri_map.reshape(-1)
        num_tris = scene.tri_positions.shape[0]
        slots = jnp.arange(cl_map.shape[0], dtype=jnp.int32)
        cids = slots // scene.cluster_tris.shape[1]
        # tri_map padding is clamped in-range (never -1, bvh/clusters.py),
        # so mask PAD-CLUSTER slots instead: their all-zero rows would
        # scatter a pad cid onto t2c[0], giving triangle 0 a garbage sort
        # key (ADVICE r4). Pad clusters are (1e30)^3 point boxes.
        real_cl = scene.cluster_min[:, 0] < jnp.float32(1e29)
        t2c = jnp.zeros((num_tris,), jnp.int32).at[
            jnp.where(real_cl[cids], cl_map, num_tris)
        ].set(cids, mode="drop")

    def make_body_dir(tile_override=None):
        def body(st):
            (sample, bounce, flag, origin, direction, thr, srad, lrad,
             sh_o, sh_d, contrib, uu, vv, nb, pix) = st[0:15]
            if budget_on:
                tcar, tric, dnc = st[15:18]
                (sample, bounce, origin, direction, thr, srad, lrad, _t,
                 tri, unres, dnc) = pallas_trace_regen(
                    scene, camera, sky, uu, vv, nb, inv_dims, frame_base,
                    spp_dyn, nf, T_MAX,
                    sample, bounce, flag, origin, direction, thr, srad,
                    lrad, sh_o, sh_d, contrib,
                    tile_override=tile_override,
                    done_mask=dnc, tri_carry=tric, t_carry=tcar,
                )
            else:
                (sample, bounce, origin, direction, thr, srad, lrad, _t, tri
                 ) = pallas_trace_regen(
                    scene, camera, sky, uu, vv, nb, inv_dims, frame_base,
                    spp_dyn, nf, T_MAX,
                    sample, bounce, flag, origin, direction, thr, srad,
                    lrad, sh_o, sh_d, contrib,
                    tile_override=tile_override,
                )
                unres = None
            live = sample < nf
            if budget_on:
                unr = live & (unres == 1)
                shade_live = live & jnp.logical_not(unr)
            else:
                shade_live = live
            noise = noise_of(nb, sample)
            (flag, origin, direction, thr, bounce, sh_o, sh_d, contrib
             ) = _nee_and_continuation(
                scene, noise, origin, direction, tri, thr, bounce,
                shade_live, sun_dir, solar_radiance, park, num_bounces,
            )
            if budget_on:
                flag = jnp.where(unr, jnp.int32(3), flag)
                tcar, tric = _t, tri
            key = _dir_bin_key(tri, direction, pix, live, unres=unres)
            order = jnp.argsort(key, stable=True)
            # Floats ride one packed gather; ints their own (same indices —
            # XLA fuses them; bitcasting ints through f32 flushes denormals
            # at this scale, CLAUDE.md).
            fcols = [origin, direction, thr, srad, lrad,
                     sh_o, sh_d, contrib, uu[:, None], vv[:, None], nb]
            icols = [sample, bounce, flag, pix]
            if budget_on:
                fcols.append(tcar[:, None])
                icols += [tric, dnc]
            packed = jnp.concatenate(fcols, axis=1)[order]
            ints = jnp.stack(icols, axis=1)[order]
            origin = packed[:, 0:3]
            direction = packed[:, 3:6]
            thr = packed[:, 6:9]
            srad = packed[:, 9:12]
            lrad = packed[:, 12:15]
            sh_o = packed[:, 15:18]
            sh_d = packed[:, 18:21]
            contrib = packed[:, 21:24]
            uu = packed[:, 24]
            vv = packed[:, 25]
            nb = packed[:, 26:28]
            sample = ints[:, 0]
            bounce = ints[:, 1]
            flag = ints[:, 2]
            pix = ints[:, 3]
            out = (sample, bounce, flag, origin, direction, thr, srad, lrad,
                   sh_o, sh_d, contrib, uu, vv, nb, pix)
            if budget_on:
                out = out + (packed[:, 28], ints[:, 4], ints[:, 5])
            return out

        return body

    def make_body_tri(tile_override=None):
        def body(st):
            (sample, bounce, flag, origin, direction, thr, srad, lrad,
             sh_o, sh_d, contrib, uu, vv, nb, pix) = st
            (sample, bounce, origin, direction, thr, srad, lrad, _t, tri
             ) = pallas_trace_regen(
                scene, camera, sky, uu, vv, nb, inv_dims, frame_base,
                spp_dyn, nf, T_MAX,
                sample, bounce, flag, origin, direction, thr, srad, lrad,
                sh_o, sh_d, contrib,
                tile_override=tile_override,
            )
            live = sample < nf
            # (A direction-aware key — tri*16 + the scatter's noise-derived
            # tangent cell — benched EXACTLY neutral on the courtyard,
            # 3.198 vs 3.199 Mrays/s: per-lane selection already tests only
            # what each lane needs, and regrouping did not move the
            # per-tile max. Keep the plain hit-tri key.)
            order = jnp.argsort(
                jnp.where(live, tri, dead_key), stable=True
            )
            # One packed row gather moves the whole lane state (sh_*/contrib/
            # flag are rebuilt by the shade below and need no permute).
            packed = jnp.concatenate(
                [
                    origin, direction, thr, srad, lrad,
                    uu[:, None], vv[:, None], nb,
                    jax.lax.bitcast_convert_type(
                        jnp.stack([sample, bounce, tri, pix], axis=1),
                        jnp.float32,
                    ),
                ],
                axis=1,
            )[order]
            origin = packed[:, 0:3]
            direction = packed[:, 3:6]
            thr = packed[:, 6:9]
            srad = packed[:, 9:12]
            lrad = packed[:, 12:15]
            uu = packed[:, 15]
            vv = packed[:, 16]
            nb = packed[:, 17:19]
            ints = jax.lax.bitcast_convert_type(packed[:, 19:23], jnp.int32)
            sample = ints[:, 0]
            bounce = ints[:, 1]
            tri = ints[:, 2]
            pix = ints[:, 3]

            live = sample < nf
            noise = noise_of(nb, sample)
            (flag, origin, direction, thr, bounce, sh_o, sh_d, contrib
             ) = _nee_and_continuation(
                scene, noise, origin, direction, tri, thr, bounce, live,
                sun_dir, solar_radiance, park, num_bounces,
            )
            return (sample, bounce, flag, origin, direction, thr, srad, lrad,
                    sh_o, sh_d, contrib, uu, vv, nb, pix)

        return body

    def make_body_nosort(tile_override=None):
        """kernel -> shade with NO permute: the trailing iterations of a
        RAYFINDER_SORT_EVERY=N>1 composite body. The sort costs ~10.25
        ms/iter at bench width (~19% of a courtyard iteration); ordering
        only affects performance, and its main win — dead-lane tail
        separation — persists across a segment, so sorting every Nth
        segment trades a slightly staler order for N-1 saved permutes."""
        def body(st):
            (sample, bounce, flag, origin, direction, thr, srad, lrad,
             sh_o, sh_d, contrib, uu, vv, nb, pix) = st[0:15]
            if budget_on:
                tcar, tric, dnc = st[15:18]
                (sample, bounce, origin, direction, thr, srad, lrad, _t,
                 tri, unres, dnc) = pallas_trace_regen(
                    scene, camera, sky, uu, vv, nb, inv_dims, frame_base,
                    spp_dyn, nf, T_MAX,
                    sample, bounce, flag, origin, direction, thr, srad,
                    lrad, sh_o, sh_d, contrib,
                    tile_override=tile_override,
                    done_mask=dnc, tri_carry=tric, t_carry=tcar,
                )
            else:
                (sample, bounce, origin, direction, thr, srad, lrad, _t, tri
                 ) = pallas_trace_regen(
                    scene, camera, sky, uu, vv, nb, inv_dims, frame_base,
                    spp_dyn, nf, T_MAX,
                    sample, bounce, flag, origin, direction, thr, srad,
                    lrad, sh_o, sh_d, contrib,
                    tile_override=tile_override,
                )
            live = sample < nf
            if budget_on:
                unr = live & (unres == 1)
                shade_live = live & jnp.logical_not(unr)
            else:
                shade_live = live
            noise = noise_of(nb, sample)
            (flag, origin, direction, thr, bounce, sh_o, sh_d, contrib
             ) = _nee_and_continuation(
                scene, noise, origin, direction, tri, thr, bounce,
                shade_live, sun_dir, solar_radiance, park, num_bounces,
            )
            out = (sample, bounce, flag, origin, direction, thr, srad, lrad,
                   sh_o, sh_d, contrib, uu, vv, nb, pix)
            if budget_on:
                flag = jnp.where(unr, jnp.int32(3), flag)
                out = (sample, bounce, flag, origin, direction, thr, srad,
                       lrad, sh_o, sh_d, contrib, uu, vv, nb, pix,
                       _t, tri, dnc)
            return out

        return body

    if budget_on and sort_key_mode != "dir":
        raise ValueError("RAYFINDER_SWEEP_BUDGET requires SORT_KEY=dir")
    make_body_sorted = (make_body_dir if sort_key_mode == "dir"
                        else make_body_tri)
    sort_every = max(int(os.environ.get("RAYFINDER_SORT_EVERY", "1")), 1)

    def make_body(tile_override=None):
        bodies = [make_body_sorted(tile_override=tile_override)]
        bodies += [make_body_nosort(tile_override=tile_override)
                   for _ in range(sort_every - 1)]
        if count_rays:
            bodies = [_count_wrap(b) for b in bodies]

        def composite(st):
            for b in bodies:
                st = b(st)
            return st

        return composite if len(bodies) > 1 else bodies[0]

    sample0 = jnp.zeros((batch,), jnp.int32)
    noise0 = noise_of(noise_base_full, sample0)
    o0, d0 = primary(u, v_tex, noise0)
    z3 = jnp.zeros((batch, 3), jnp.float32)
    state = (
        sample0,
        jnp.ones((batch,), jnp.int32),
        jnp.zeros((batch,), jnp.int32),  # no pending NEE on entry
        o0,
        d0,
        jnp.ones((batch, 3), jnp.float32),
        z3,
        z3,  # lane radiance; scatter-added into pixels at phase end
        jnp.broadcast_to(park, (batch, 3)),
        jnp.broadcast_to(jnp.asarray([1.0, 0.0, 0.0], jnp.float32), (batch, 3)),
        z3,
        u,
        v_tex,
        noise_base_full,
        jnp.arange(batch, dtype=jnp.int32),  # pix: lanes migrate from iter 1
    )
    if budget_on:
        state = state + (
            jnp.full((batch,), T_MAX, jnp.float32),   # resume bound
            jnp.full((batch,), -1, jnp.int32),        # resume tri
            jnp.zeros((batch,), jnp.int32),           # done-super bitmask
        )
    small_scene = scene.cluster_tris.shape[0] <= SORT_THRESHOLD
    ft = _FULL_TILE
    full_tiles = (ft, 4096 // ft) if (small_scene and batch >= 4096) else None
    body = make_body(tile_override=full_tiles)
    if count_rays:
        state = state + (jnp.zeros((2,), jnp.int32),)

    floor = _COMPACT_FLOOR if compact_floor is None else compact_floor
    lrad_full = accum
    for size in _phase_sizes(batch, floor)[1:]:
        def above(st, size=size):
            return jnp.sum((st[0] < nf).astype(jnp.int32)) > jnp.int32(size)

        state = jax.lax.while_loop(above, body, state)

        if count_rays:
            *state, cnt = state
        (sample, bounce, flag, origin, direction, thr, srad, lrad,
         sh_o, sh_d, contrib, uu, vv, nb, pix) = state[0:15]
        lrad_full = lrad_full.at[pix].add(lrad, mode="drop")
        # Live lanes are already sorted to the front (dead keys sort last),
        # but only since the last in-body sort; nonzero-compact exactly.
        busy = sample < nf
        idx = jnp.nonzero(busy, size=size, fill_value=0)[0].astype(jnp.int32)
        valid = jnp.arange(size, dtype=jnp.int32) < jnp.sum(busy.astype(jnp.int32))
        fl = [origin, direction, thr, srad, sh_o, sh_d, contrib, uu, vv, nb]
        il = [sample, bounce, flag, pix]
        if budget_on:
            fl.append(state[15])
            il += [state[16], state[17]]
        taken_f, taken_i = _take_packed(idx, fl, il)
        (origin, direction, thr, srad, sh_o, sh_d, contrib, uu, vv, nb
         ) = taken_f[0:10]
        sample, bounce, flag, pix = taken_i[0:4]
        state = (
            jnp.where(valid, sample, nf),
            bounce, flag, origin, direction,
            thr, srad, jnp.zeros((size, 3), jnp.float32),
            sh_o, sh_d, contrib,
            uu, vv, nb,
            jnp.where(valid, pix, jnp.int32(batch)),  # out of range -> drop
        )
        if budget_on:
            state = state + (taken_f[10], taken_i[4], taken_i[5])
        body = make_body()
        if count_rays:
            state = state + (cnt,)

    def any_left(st):
        return jnp.any(st[0] < nf)

    state = jax.lax.while_loop(any_left, body, state)
    out = lrad_full.at[state[14]].add(state[7], mode="drop")
    if count_rays:
        return out, _counts_to_rays(state[-1], batch * num_frames, num_bounces)
    return out


def pick_accumulator(scene: DeviceScene, engine: str):
    """Progressive-accumulator selection shared by render_image and Renderer:
    the persistent-wavefront regen loop whenever it's safe and profitable —
    always for small (tile-coherent) scenes, and for big scenes on the pallas
    engine, where the fused loop re-sorts lanes per iteration
    (_accumulate_regen_fused_sorted; measured +37% on courtyard over the
    sorted scan form). Big scenes on the unfused engines keep the scan form,
    whose per-bounce coherence sort needs the lane==pixel-free formulation."""
    big_scene = scene.cluster_tris.shape[0] > SORT_THRESHOLD
    if not big_scene:
        return accumulate_samples_regen
    if engine == "pallas" and _regen_sort_enabled(scene):
        return accumulate_samples_regen
    return accumulate_samples


@partial(
    jax.jit,
    static_argnames=("win_w", "win_h", "width", "height", "num_bounces", "spp", "num_frames", "engine"),
    donate_argnums=(5,),
)
def accumulate_samples_window(
    scene: DeviceScene,
    sky: SkyState,
    camera: Camera,
    blue_noise_tile,
    frame_base,
    accum,
    x0,
    y0,
    *,
    win_w: int,
    win_h: int,
    width: int,
    height: int,
    num_bounces: int,
    spp: int,
    num_frames: int,
    engine: str = "pallas",
):
    """accumulate_samples over a (win_w, win_h) sub-window at traced offset
    (x0, y0) of the full framebuffer — one compile serves every tile of a
    large render (the reference bounds work volume the same way, capping
    buffers to device limits, reference_path_tracer.cpp:253-263).

    accum: (win_h * win_w, 3) block-ordered for the window."""
    from .rng import animated_blue_noise
    from .tiling import block_order

    ys_np, xs_np, _ = block_order(win_w, win_h)
    ys = jnp.asarray(ys_np) + y0
    xs = jnp.asarray(xs_np) + x0
    u = (xs.astype(jnp.float32) + 0.5) / jnp.float32(width)
    v_tex = (ys.astype(jnp.float32) + 0.5) / jnp.float32(height)

    def body(accum, k):
        frame_idx = frame_base + k
        noise = animated_blue_noise(ys, xs, frame_idx, jnp.int32(spp), tile=blue_noise_tile)
        jitter = noise / jnp.asarray([width, height], jnp.float32)
        ray_u = u + jitter[:, 0]
        ray_v = (jnp.float32(1.0) - v_tex) + jitter[:, 1]
        origin, direction = generate_camera_ray_lens(camera, noise, ray_u, ray_v)
        sample = trace_radiance(scene, sky, origin, direction, noise, num_bounces, engine)
        return accum + sample, None

    accum, _ = jax.lax.scan(body, accum, jnp.arange(num_frames, dtype=jnp.int32))
    return accum


def render_image_tiled(
    scene: DeviceScene,
    sky: SkyState,
    camera: Camera,
    *,
    width: int,
    height: int,
    sampling: SamplingParams = SamplingParams(),
    exposure: float = 1.0,
    engine: str = "pallas",
    tile_w: int = 512,
    tile_h: int = 512,
    samples_per_dispatch: int = 8,
) -> np.ndarray:
    """Render a large framebuffer window by window. One compiled program per
    window SHAPE (edge windows reuse the same shape via clamped offsets), so
    arbitrary resolutions render with bounded per-dispatch device work."""
    from .rng import blue_noise_tile
    from .tiling import block_order, unswizzle
    from .tonemap import tonemap

    tile = jnp.asarray(blue_noise_tile())
    spp = sampling.num_samples_per_pixel
    out = np.empty((height, width, 3), np.float32)

    for y0 in range(0, height, tile_h):
        for x0 in range(0, width, tile_w):
            # Clamp so edge windows share the interior window shape.
            wx = min(x0, max(0, width - tile_w))
            wy = min(y0, max(0, height - tile_h))
            win_w = min(tile_w, width)
            win_h = min(tile_h, height)

            accum = jnp.zeros((win_h * win_w, 3), jnp.float32)
            frame_idx = 0
            while frame_idx < spp:
                batch = min(samples_per_dispatch, spp - frame_idx)
                accum = accumulate_samples_window(
                    scene, sky, camera, tile,
                    jnp.int32(frame_idx), accum, jnp.int32(wx), jnp.int32(wy),
                    win_w=win_w, win_h=win_h, width=width, height=height,
                    num_bounces=sampling.num_bounces, spp=spp,
                    num_frames=batch, engine=engine,
                )
                frame_idx += batch
            img = tonemap(unswizzle(accum, win_w, win_h) / jnp.float32(spp), exposure)
            img = np.asarray(img).reshape(win_h, win_w, 3)
            out[wy : wy + win_h, wx : wx + win_w] = img
    return out


def render_image(
    scene: DeviceScene,
    sky: SkyState,
    camera: Camera,
    *,
    width: int,
    height: int,
    sampling: SamplingParams = SamplingParams(),
    exposure: float = 1.0,
    engine: str = "pallas",
    samples_per_dispatch: int = 32,
) -> np.ndarray:
    """Render a full image: spp progressive samples, running-mean estimator,
    ACES tonemap + gamma (wgsl:59-63). Returns (H, W, 3) float32 in [0, 1]."""
    from .rng import blue_noise_tile
    from .tonemap import tonemap

    tile = jnp.asarray(blue_noise_tile())
    accum = jnp.zeros((height * width, 3), jnp.float32)
    spp = sampling.num_samples_per_pixel
    big_scene = scene.cluster_tris.shape[0] > SORT_THRESHOLD
    accumulate = pick_accumulator(scene, engine)
    if big_scene:
        # Cap device time per dispatch: a single multi-minute program can
        # crash the TPU worker (observed on a 254K-tri 1080p 32-sample
        # dispatch); big scenes take seconds per sample.
        samples_per_dispatch = min(samples_per_dispatch, 4)
    frame_idx = 0
    while frame_idx < spp:
        batch = min(samples_per_dispatch, spp - frame_idx)
        accum = accumulate(
            scene,
            sky,
            camera,
            tile,
            jnp.int32(frame_idx),
            accum,
            width=width,
            height=height,
            num_bounces=sampling.num_bounces,
            spp=spp,
            num_frames=batch,
            engine=engine,
        )
        frame_idx += batch
    from .tiling import unswizzle

    estimator = unswizzle(accum, width, height) / jnp.float32(spp)
    img = tonemap(estimator, exposure)
    return np.asarray(img).reshape(height, width, 3)
