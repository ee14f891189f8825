"""Benchmark: Duck.glb full path trace on one chip (BASELINE config 3).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Measures steady-state rays/second of the wavefront path tracer at 800x600
with the reference's renderer defaults (4 bounces). Rays are counted
EXACTLY: the regen loop accumulates an int32 [closest, shadow] segment
counter (pathtracer count_rays — one closest-hit segment per bounce-loop
iteration plus one NEE shadow ray per surface hit, the same accounting the
reference's megakernel implies, reference_path_tracer.wgsl:180-234).
vs_baseline is relative to the driver's north-star target of 200
Mrays/s/chip (BASELINE.md) — the reference itself publishes no numbers.

Robustness (the axon TPU tunnel has outages measured in hours, CLAUDE.md):
  * the measurement runs in a CHILD process so a TPU worker fault cannot
    take down the benchmark; the parent falls back engine-by-engine
    (pallas -> wavefront);
  * the parent RETRIES on a budget (default 60 min, RAYFINDER_BENCH_BUDGET_S)
    — probing the tunnel cheaply between attempts — instead of giving up
    after one probe. A value of 0.0 means no attempt inside the budget
    survived (the tunnel stayed down).
"""

from __future__ import annotations

import json
import os
import pathlib
import subprocess
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
pathlib.Path(os.environ["JAX_COMPILATION_CACHE_DIR"]).mkdir(parents=True, exist_ok=True)

import numpy as np

DUCK = "/root/reference/assets/Duck.glb"
WIDTH, HEIGHT = 800, 600
BOUNCES = 4
TIMED_SAMPLES = int(os.environ.get("RAYFINDER_BENCH_SAMPLES", "64"))
TARGET_MRAYS = 200.0


def main() -> None:
    import jax
    import jax.numpy as jnp

    from rayfinder_tpu.render.camera import create_camera
    from rayfinder_tpu.render.pathtracer import accumulate_samples_regen
    from rayfinder_tpu.render.rng import blue_noise_tile
    from rayfinder_tpu.render.scene import load_device_scene
    from rayfinder_tpu.sky.model import sky_state_from_ui

    scene = load_device_scene(DUCK)
    camera = create_camera(
        [2.0, 1.5, 2.0], [0.1, 0.8, 0.0], 0.0, 1.0, 70.0, WIDTH / HEIGHT
    )
    sky = sky_state_from_ui(1.0, (1.0, 1.0, 1.0), 30.0, 0.0)
    tile = jnp.asarray(blue_noise_tile())

    accum = jnp.zeros((WIDTH * HEIGHT, 3), jnp.float32)

    def step(frame_idx, accum, n):
        return accumulate_samples_regen(
            scene,
            sky,
            camera,
            tile,
            jnp.int32(frame_idx),
            accum,
            width=WIDTH,
            height=HEIGHT,
            num_bounces=BOUNCES,
            spp=256,
            num_frames=n,
            engine=os.environ.get("RAYFINDER_ENGINE", "pallas"),
            count_rays=True,
        )

    # block_until_ready is unreliable through the axon tunnel (returns while
    # work is still queued); fence with a jitted scalar reduction + host fetch.
    fence = jax.jit(lambda a: jnp.sum(a))

    accum, _ = step(0, accum, TIMED_SAMPLES)  # warmup batch (also compiles)
    float(fence(accum))

    t0 = time.time()
    accum, rays = step(TIMED_SAMPLES, accum, TIMED_SAMPLES)
    float(fence(accum))
    dt = time.time() - t0

    closest, shadow = (int(x) for x in np.asarray(rays))
    total_rays = closest + shadow
    mrays = total_rays / dt / 1e6

    # Print the measurement FIRST: everything after this line is diagnostic,
    # and a post-measurement worker fault must not discard a good number.
    line = {
        "metric": "duck_800x600_4bounce_path_trace",
        "value": round(mrays, 3),
        "unit": "Mrays/s/chip",
        "vs_baseline": round(mrays / TARGET_MRAYS, 4),
    }
    _quality_gate(line, accum, 2 * TIMED_SAMPLES, WIDTH, HEIGHT, "duck")
    print(json.dumps(line), flush=True)

    # Diagnostic only (stderr): measured counts vs the old geometric-series
    # model from the primary hit rate, for the record.
    try:
        h = _primary_hit_rate(scene, camera)
        model = (
            WIDTH * HEIGHT * TIMED_SAMPLES
            * (sum(h**b for b in range(BOUNCES)) + sum(h**b for b in range(1, BOUNCES + 1)))
        )
        print(
            f"rays measured={total_rays} (closest={closest} shadow={shadow}) "
            f"model={model:.0f} model/measured={model / total_rays:.4f} dt={dt:.3f}s",
            file=sys.stderr,
        )
    except Exception as e:  # diagnostic must never cost the measurement
        print(f"bench: hit-rate diagnostic failed: {e!r}", file=sys.stderr)


def main_courtyard() -> None:
    """Big-scene child (the PRIMARY metric per BASELINE.md): courtyard 254K
    tris, 512x512 window, 4 bounces, fused regen accumulator with exact ray
    accounting — the same measurement as prof/bench_courtyard.py, emitted as
    a JSON line so the parent can fold it into the driver's single line."""
    import jax
    import jax.numpy as jnp

    from rayfinder_tpu.render.camera import create_camera
    from rayfinder_tpu.render.pathtracer import accumulate_samples_regen
    from rayfinder_tpu.render.rng import blue_noise_tile
    from rayfinder_tpu.render.scene import build_device_scene
    from rayfinder_tpu.scene.procedural import courtyard_scene
    from rayfinder_tpu.sky.model import sky_state_from_ui

    w, h, nf, bounces = 512, 512, int(os.environ.get("RAYFINDER_COURT_SAMPLES", "16")), 4
    # BASELINE config 4 specifies base-color textures, so the primary metric
    # includes the texture-gather cost by default (TPU A/B 2026-08-20:
    # textured 3.436/3.436 vs 3.495 untextured, -1.7%).
    textured = os.environ.get("RAYFINDER_COURT_TEXTURED", "1") == "1"
    if os.environ.get("RAYFINDER_COURT_PT", "1") == "1":
        # The measured scene rides the PRODUCTION asset path (VERDICT r4
        # #5): GLB -> gltf loader -> .pt (PTFORMAT3) -> device scene,
        # exported once and cached on disk.
        scene = _courtyard_pt_scene(textured)
    else:
        flat, textures = courtyard_scene(26, textured=textured)
        scene = build_device_scene(flat, textures=textures)
    camera = create_camera([-16.0, 5.0, 0.0], [12.0, 2.0, 0.0], 0.0, 1.0, 70.0, w / h)
    sky = sky_state_from_ui(2.5, (0.3, 0.3, 0.3), 35.0, 25.0)
    tile = jnp.asarray(blue_noise_tile())
    fence = jax.jit(lambda a: jnp.sum(a))

    def step(fb, accum):
        return accumulate_samples_regen(
            scene, sky, camera, tile, jnp.int32(fb), accum,
            width=w, height=h, num_bounces=bounces, spp=256, num_frames=nf,
            engine=os.environ.get("RAYFINDER_COURT_ENGINE", "pallas"),
            count_rays=True)

    accum = jnp.zeros((w * h, 3), jnp.float32)
    accum, _ = step(0, accum)
    float(fence(accum))
    t0 = time.time()
    accum, rays = step(nf, accum)
    float(fence(accum))
    dt = time.time() - t0

    closest, shadow = (int(x) for x in np.asarray(rays))
    total = closest + shadow
    mrays = total / dt / 1e6
    # Extrapolated wall time for the showcase target: 1080p at 1024 spp is
    # (1920*1080*1024)/(512*512*nf) times the timed window's sample work.
    t1024 = dt * (1920 * 1080 * 1024) / (w * h * nf)
    line = {
        "metric": "courtyard_512x512_4bounce_path_trace",
        "value": round(mrays, 3),
        "unit": "Mrays/s/chip",
        "time_to_1024spp_1080p_s": round(t1024, 1),
    }
    if os.environ.get("RAYFINDER_COURT_TEXTURED", "1") == "1" and nf == 16:
        _quality_gate(line, accum, 2 * nf, w, h, "courtyard")
    print(json.dumps(line), flush=True)
    print(
        f"courtyard rays={total} (closest={closest} shadow={shadow}) dt={dt:.3f}s",
        file=sys.stderr,
    )
    if os.environ.get("RAYFINDER_BENCH_EFF", "1") == "1":
        eff = _courtyard_efficiency(scene, camera, w, h)
        if eff:
            # Re-print the JSON line with the efficiency fields folded in
            # (VERDICT r4 #4). The parent takes the LAST metric line, so a
            # fault above never costs the measurement already printed.
            line.update(eff)
            print(json.dumps(line), flush=True)


def _courtyard_pt_scene(textured: bool):
    """Benchmark courtyard via GLB -> loader -> .pt -> device scene,
    cached at a stable path so the (one-time) export+BVH build never rides
    a timed window. Falls back to the procedural build on any failure —
    the measurement must never be lost to an asset-path problem."""
    try:
        import tempfile

        from rayfinder_tpu.io import PtScene, read_pt, write_pt
        from rayfinder_tpu.scene.procedural import courtyard_scene
        from rayfinder_tpu.tools.export_glb import export_flattened_glb

        cache_dir = pathlib.Path(
            os.environ.get("RAYFINDER_PT_CACHE", "/root/.cache/rayfinder"))
        cache_dir.mkdir(parents=True, exist_ok=True)
        pt = cache_dir / f"courtyard_s26_tex{int(textured)}.pt"
        if not pt.exists():
            flat, textures = courtyard_scene(26, textured=textured)
            with tempfile.TemporaryDirectory() as td:
                glb = pathlib.Path(td) / "courtyard.glb"
                export_flattened_glb(flat, textures, glb)
                write_pt(PtScene.from_gltf(glb), pt)
        scene = read_pt(pt).to_device_scene()
        print(f"courtyard scene loaded from .pt: {pt} "
              f"({pt.stat().st_size / 1e6:.1f} MB)", file=sys.stderr)
        return scene
    except Exception as e:
        print(f"bench: .pt courtyard path failed ({e!r}); "
              "falling back to procedural build", file=sys.stderr)
        from rayfinder_tpu.render.scene import build_device_scene
        from rayfinder_tpu.scene.procedural import courtyard_scene

        flat, textures = courtyard_scene(26, textured=textured)
        return build_device_scene(flat, textures=textures)


def _courtyard_efficiency(scene, camera, w, h) -> dict | None:
    """Traversal-efficiency diagnostic (VERDICT r3 #7 / r4 #4): issued MT
    tests vs the per-ray front-to-back NEED, on the bench camera's PRIMARY
    rays and on dir-key-sorted BOUNCE-1/2 populations (the populations every
    measurement says carry the divergence cost), via the counted
    grouped-sweep kernel (prof/diag_iters.py). Runs AFTER the measurement
    JSON is printed — a fault here never costs the number. Returns the
    mt_waste_* fields for the JSON line."""
    try:
        import jax
        import jax.numpy as jnp

        if jax.default_backend() != "tpu":
            return None  # interpret-mode counted kernels impractically slow

        sys.path.insert(0, str(pathlib.Path(__file__).parent / "prof"))
        from diag_iters import cosine_bounce, counted_closest, dir_key_order

        from rayfinder_tpu.render.camera import generate_camera_ray
        from rayfinder_tpu.render.wavefront import _slab_entry

        prebuilt = os.environ.get("RAYFINDER_PREBUILT", "0") == "1"
        tile = 128
        leaf = scene.cluster_tris.shape[1]

        # Per-ray NEED: clusters whose entry precedes the true hit (what a
        # per-ray front-to-back walk must test), dense slab in chunks.
        @jax.jit
        def need_chunk(o_c, d_c, t_c):
            inv = jnp.float32(1.0) / d_c
            hit_c, entry = _slab_entry(
                o_c[:, None, :], inv[:, None, :], (inv < 0.0)[:, None, :],
                scene.cluster_min[None], scene.cluster_max[None],
                t_c[:, None],
            )
            return jnp.sum((hit_c & (entry < t_c[:, None])).astype(jnp.int32))

        def measure(tag, o, d):
            hit, t, tri, sv, it = counted_closest(
                scene, o, d, jnp.float32(1e4), prebuilt=prebuilt)
            nrays = o.shape[0]
            issued = int(np.asarray(it, np.int64).sum()) * tile * leaf
            t_true = jnp.where(hit, t, jnp.float32(1e4))
            needed_clusters = 0
            for s in range(0, nrays, 16384):
                needed_clusters += int(need_chunk(
                    o[s:s + 16384], d[s:s + 16384], t_true[s:s + 16384]))
            needed = needed_clusters * leaf
            waste = 100.0 * (1.0 - needed / max(issued, 1))
            print(
                f"efficiency({tag} rays): issued_mt_tests={issued} "
                f"({issued / nrays:.0f}/ray) needed={needed} "
                f"({needed / nrays:.0f}/ray) wasted={waste:.1f}% "
                f"supers/tile={float(np.asarray(sv).mean()):.1f} "
                f"inner_iters/tile={float(np.asarray(it).mean()):.1f}",
                file=sys.stderr,
            )
            return hit, t, tri, round(waste, 1)

        js, is_ = np.meshgrid(np.arange(w), np.arange(h), indexing="xy")
        u = (js.reshape(-1) + 0.5).astype(np.float32) / w
        v = 1.0 - (is_.reshape(-1) + 0.5).astype(np.float32) / h
        o, d = generate_camera_ray(camera, jnp.asarray(u), jnp.asarray(v))
        hit, t, tri, waste_p = measure("primary", o, d)
        fields = {"mt_waste_primary": waste_p}

        # Bounce populations: cosine scatter off the hit surfaces, lanes
        # ordered by the production dir key — what the sorted fused loop's
        # kernel actually sees. Deterministic for the fixed bench scene, so
        # the counted-kernel shapes stay cache-stable across rounds.
        rng = np.random.default_rng(7)
        on, dn = np.asarray(o), np.asarray(d)
        for b in (1, 2):
            on, dn, trih = cosine_bounce(
                scene, on, dn, np.asarray(hit), np.asarray(t),
                np.asarray(tri), rng)
            order = dir_key_order(scene, dn, trih)
            on, dn = on[order], dn[order]
            hit, t, tri, waste_b = measure(
                f"bounce{b}-dirsorted", jnp.asarray(on), jnp.asarray(dn))
            fields[f"mt_waste_bounce{b}"] = waste_b
        return fields
    except Exception as e:  # diagnostic only
        print(f"bench: efficiency diagnostic failed: {e!r}", file=sys.stderr)
        return None


_QUALITY_RMSE_BUDGET = 1e-3  # BASELINE north star: RMSE < 1e-3 at scale


def _quality_gate(line: dict, accum, total_spp: int, w: int, h: int, name: str) -> None:
    """RMSE-gate the bench accumulation against the committed wavefront-engine
    golden at the same resolution/sample sequence (tools/make_quality_goldens.py).
    Adds quality_rmse/quality_ok to the JSON line; never costs the measurement."""
    try:
        import jax.numpy as jnp

        from rayfinder_tpu.render.tonemap import tonemap

        golden_path = (
            pathlib.Path(__file__).parent / "tests" / "goldens"
            / f"quality_{name}_{w}x{h}_{total_spp}spp.npz"
        )
        if not golden_path.exists():
            return
        golden = np.load(golden_path)["image"].astype(np.float32)
        img = np.asarray(
            tonemap(accum / jnp.float32(total_spp), jnp.float32(0.25)),
            np.float32,
        ).reshape(h, w, 3)
        rmse = float(np.sqrt(np.mean((img - golden) ** 2)))
        line["quality_rmse"] = round(rmse, 7)
        line["quality_ok"] = bool(rmse < _QUALITY_RMSE_BUDGET)
    except Exception as e:  # the gate must never cost the measurement
        print(f"bench: quality gate failed to run: {e!r}", file=sys.stderr)


def _primary_hit_rate(scene, camera) -> float:
    import jax.numpy as jnp

    from rayfinder_tpu.render.camera import generate_camera_ray
    from rayfinder_tpu.render.wavefront import intersect_closest_wavefront

    n = 128
    js, is_ = np.meshgrid(np.arange(n), np.arange(n), indexing="xy")
    u = js.reshape(-1).astype(np.float32) / n
    v = 1.0 - (is_.reshape(-1) + 1.0).astype(np.float32) / n
    o, d = generate_camera_ray(camera, u, v)
    hit, _, _, _ = intersect_closest_wavefront(scene, o, d, jnp.float32(1e4))
    return float(np.asarray(hit).mean())


def _probe_device(timeout_s: float = 600.0) -> bool:
    """Cheap tunnel-health check in a throwaway process (a dead axon tunnel
    hangs every jax import; never touch jax in the parent). Importing
    rayfinder_tpu first installs the persistent-cache config, so the probe
    compile itself caches: on a COLD cache the remote compile helper takes
    3+ minutes even for a trivial jit (measured 195s, 2026-08-21), hence
    the generous default timeout — a repeatedly-timing-out probe starves
    the whole bench budget."""
    repo = str(pathlib.Path(__file__).resolve().parent)
    code = (
        f"import sys; sys.path.insert(0, {repo!r});"
        "import rayfinder_tpu, jax, jax.numpy as jnp;"
        "print(float(jax.jit(lambda a: (a*2+1).sum())(jnp.arange(16.0))))"
    )
    try:
        r = subprocess.run(
            [sys.executable, "-c", code], capture_output=True, timeout=timeout_s
        )
        return r.returncode == 0
    except subprocess.TimeoutExpired:
        return False


def _fail_line() -> str:
    return json.dumps(
        {
            "metric": "duck_800x600_4bounce_path_trace",
            "value": 0.0,
            "unit": "Mrays/s/chip",
            "vs_baseline": 0.0,
        }
    )


def _try_engines(deadline: float) -> str | None:
    """One pass over the engine ladder; returns the child's JSON line or
    None. An explicit RAYFINDER_ENGINE is tried first; the XLA wavefront
    engine remains the fallback so a fast-path fault still yields a
    measurement."""
    engines = [os.environ.get("RAYFINDER_ENGINE", "pallas")]
    if "wavefront" not in engines:
        engines.append("wavefront")
    for i, engine in enumerate(engines):
        remaining = deadline - time.time()
        if remaining < 120.0:
            return None
        env = dict(os.environ)
        env["RAYFINDER_BENCH_CHILD"] = "1"
        env["RAYFINDER_ENGINE"] = engine
        t0 = time.time()
        stdout = stderr = ""
        status = "timed out"
        try:
            r = subprocess.run(
                [sys.executable, "-u", os.path.abspath(__file__)],
                capture_output=True,
                text=True,
                timeout=min(2400.0, remaining),
                env=env,
            )
            stdout, stderr, status = r.stdout, r.stderr, f"exited {r.returncode}"
        except subprocess.TimeoutExpired as e:
            # The child may have printed the JSON line BEFORE hanging in a
            # post-measurement diagnostic — salvage whatever it wrote.
            stdout = (e.stdout or b"").decode(errors="replace") if isinstance(e.stdout, bytes) else (e.stdout or "")
            stderr = (e.stderr or b"").decode(errors="replace") if isinstance(e.stderr, bytes) else (e.stderr or "")
        print(
            f"bench: engine={engine} child {status} after {time.time() - t0:.0f}s",
            file=sys.stderr,
        )
        sys.stderr.write(stderr or "")
        # LAST metric line: a child may re-print the line with diagnostic
        # fields folded in after the initial (fault-safe) print.
        found = None
        for line in (stdout or "").splitlines():
            line = line.strip()
            if line.startswith("{") and '"metric"' in line:
                found = line
        if found is not None:
            return found
        if i + 1 < len(engines):
            # Child died or hung (worker fault?): give the TPU a moment
            # before the fallback engine tries to attach.
            time.sleep(30.0)
    return None


def _try_courtyard(deadline: float) -> dict | None:
    """Run the courtyard child once (child-isolated like the Duck ladder);
    returns its parsed JSON dict or None. Cheap relative to Duck (single
    fused dispatch per batch) but compiles are slow cold, so it gets a
    generous per-attempt timeout inside the remaining budget."""
    remaining = deadline - time.time()
    if remaining < 120.0:
        return None
    env = dict(os.environ)
    env["RAYFINDER_BENCH_CHILD"] = "courtyard"
    t0 = time.time()
    stdout = stderr = ""
    status = "timed out"
    try:
        r = subprocess.run(
            [sys.executable, "-u", os.path.abspath(__file__)],
            capture_output=True,
            text=True,
            timeout=min(2400.0, remaining),
            env=env,
        )
        stdout, stderr, status = r.stdout, r.stderr, f"exited {r.returncode}"
    except subprocess.TimeoutExpired as e:
        stdout = (e.stdout or b"").decode(errors="replace") if isinstance(e.stdout, bytes) else (e.stdout or "")
        stderr = (e.stderr or b"").decode(errors="replace") if isinstance(e.stderr, bytes) else (e.stderr or "")
    print(
        f"bench: courtyard child {status} after {time.time() - t0:.0f}s",
        file=sys.stderr,
    )
    sys.stderr.write(stderr or "")
    found = None
    for line in (stdout or "").splitlines():
        line = line.strip()
        if line.startswith("{") and '"metric"' in line:
            found = line
    if found is not None:
        try:
            return json.loads(found)
        except json.JSONDecodeError:
            return None
    return None


def _parent() -> None:
    budget = float(os.environ.get("RAYFINDER_BENCH_BUDGET_S", "3600"))
    deadline = time.time() + budget
    attempt = 0
    duck: dict | None = None
    while time.time() < deadline:
        attempt += 1
        remaining = deadline - time.time()
        print(
            f"bench: attempt {attempt}, {remaining:.0f}s of budget left",
            file=sys.stderr,
        )
        if not _probe_device(timeout_s=min(600.0, max(60.0, remaining))):
            # Tunnel down or hung; recovery has been observed to take
            # minutes to hours. Re-probe on a patient cadence.
            time.sleep(min(90.0, max(0.0, deadline - time.time())))
            continue
        line = _try_engines(deadline)
        if line is not None:
            try:
                duck = json.loads(line)
            except json.JSONDecodeError:
                duck = None
            if duck is not None:
                break
        time.sleep(min(60.0, max(0.0, deadline - time.time())))
    if duck is None:
        print(_fail_line())
        return
    # Primary metric (BASELINE.md): Sponza-class Mrays/s. Fold the courtyard
    # number into the SAME single line so the driver records it every round.
    court = _try_courtyard(deadline)
    if court is None and time.time() < deadline:
        time.sleep(30.0)  # one retry after a possible worker fault
        court = _try_courtyard(deadline)
    duck["courtyard_mrays"] = float(court.get("value", 0.0)) if court else 0.0
    duck["time_to_1024spp_1080p_s"] = (
        float(court.get("time_to_1024spp_1080p_s", 0.0)) if court else 0.0
    )
    if court:
        for k in ("mt_waste_primary", "mt_waste_bounce1", "mt_waste_bounce2"):
            if k in court:
                duck[k] = court[k]
    # Quality gate (tools/make_quality_goldens.py): worst RMSE across the two
    # children's full-scale renders vs the wavefront-engine goldens.
    rmses = [c["quality_rmse"] for c in (duck, court) if c and "quality_rmse" in c]
    if rmses:
        duck["quality_rmse"] = max(rmses)
        duck["quality_ok"] = bool(max(rmses) < _QUALITY_RMSE_BUDGET)
    print(json.dumps(duck))


if __name__ == "__main__":
    child = os.environ.get("RAYFINDER_BENCH_CHILD")
    if child == "courtyard":
        main_courtyard()
    elif child:
        main()
    else:
        _parent()
