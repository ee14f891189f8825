"""Offline simulator of the grouped tile sweep, faithful to the kernel's
structure (tile-uniform front-to-back super visits; per-lane front-to-back
cluster selection within the DMA'd super; per-lane erase; bound shrink on
accept), plus K-rays-per-lane aggregation variants where each lane owns K
rays and serves whichever still has work in the visited super.

Bound evolution surrogate: a lane's bound drops to its true hit t when it
tests the cluster CONTAINING its true hit (intermediate farther accepts are
ignored — iteration counts are slight overestimates). VALIDATE the K=1
baseline against the on-TPU counters (prof/diag_iters.py) before trusting
the K>1 predictions.

Usage: python prof/sim_ksweep.py [ntiles=256]   (reads /tmp/court_rays.npz)
"""
import sys
import numpy as np

TMAX = np.float32(1e4)
LANES = 128
G = 128  # clusters per super (blind chunks, like _scene_tables_grouped)


def slab_entry(cmin, cmax, o, d):
    """(C, lanes) entry distances, +inf where the slab test fails at TMAX."""
    inv = np.float32(1.0) / d  # (lanes, 3)
    lo = (cmin[:, None, :] - o[None, :, :]) * inv[None, :, :]
    hi = (cmax[:, None, :] - o[None, :, :]) * inv[None, :, :]
    t0 = np.minimum(lo, hi).max(axis=2)
    t1 = np.maximum(lo, hi).min(axis=2)
    ok = (t0 <= t1) & (t1 > 0) & (t0 < TMAX)
    return np.where(ok, np.maximum(t0, 0.0), np.inf).astype(np.float32)


def sim_group(entries, hitcl, thit):
    """One aggregated sweep: entries/hitcl/thit are lists of K per-ray-set
    arrays ((C,lanes) f32, (lanes,) i32, (lanes,) f32). Returns (sv, it)."""
    K = len(entries)
    C = entries[0].shape[0]
    S = C // G
    E = [e.copy() for e in entries]
    bt = [np.full(LANES, TMAX, np.float32) for _ in range(K)]
    sup_live = np.ones(S, bool)
    sv = it = 0
    while True:
        semin = np.full((S,), np.inf, np.float32)
        sem_k = [
            np.where(E[k] < bt[k][None, :], E[k], np.inf)
            .reshape(S, G, LANES).min(axis=(1, 2))
            for k in range(K)
        ]
        semin = np.minimum.reduce(sem_k)
        semin[~sup_live] = np.inf
        s = int(np.argmin(semin))
        if not np.isfinite(semin[s]):
            break
        sv += 1
        Es = [E[k][s * G:(s + 1) * G] for k in range(K)]
        while True:
            ms = [np.where(Es[k] < bt[k][None, :], Es[k], np.inf)
                  for k in range(K)]
            has = np.stack([np.isfinite(m).any(axis=0) for m in ms])  # (K, lanes)
            if not has.any():
                break
            # per-lane active ray = first k with work in this super
            active = np.argmax(has, axis=0)  # (lanes,) 0 when none
            m_act = np.stack(ms)[active, :, np.arange(LANES)].T  # (G, lanes)
            j = np.argmin(m_act, axis=0)  # per-lane row (0 spurious when none)
            glob = s * G + j
            for k in range(K):
                lane_k = active == k
                acc = lane_k & (glob == hitcl[k]) & (thit[k] < bt[k])
                bt[k] = np.where(acc, thit[k], bt[k])
                Es[k][j[lane_k], np.nonzero(lane_k)[0]] = np.inf
            it += 1
        sup_live[s] = False
    return sv, it


def main():
    ntiles = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    z = np.load("/tmp/court_rays.npz")
    cmin, cmax = z["cluster_min"], z["cluster_max"]
    C = cmin.shape[0]
    Cpad = -(-C // G) * G
    pad = Cpad - C
    if pad:
        cmin = np.concatenate([cmin, np.full((pad, 3), np.float32(1e30))])
        cmax = np.concatenate([cmax, np.full((pad, 3), np.float32(1e30))])
    start = z["cluster_start"].astype(np.int64)

    tag = "bounce1srt"
    o, d = z[f"{tag}_o"], z[f"{tag}_d"]
    hit, t, tri = z[f"{tag}_hit"], z[f"{tag}_t"], z[f"{tag}_tri"]
    # cluster containing each true hit tri (clusters are [start_i, start_{i+1}) runs
    # in leaf order; padded degenerate clusters repeat start — searchsorted side
    # 'right' finds the last cluster whose start <= tri, which is the real one)
    hitcl_all = np.searchsorted(start, np.maximum(tri, 0), side="right") - 1
    hitcl_all = np.where(hit, hitcl_all, -1).astype(np.int64)
    thit_all = np.where(hit, t, TMAX).astype(np.float32)

    T = o.shape[0] // LANES
    rng = np.random.default_rng(3)
    pick = np.sort(rng.choice(T, size=min(ntiles, T), replace=False))
    print(f"rays {o.shape[0]} tiles {T} sampled {len(pick)} clusters {C}")

    # Precompute per-tile entry tables for sampled tiles and their K-partners.
    def tile_data(ti):
        sl = slice(ti * LANES, (ti + 1) * LANES)
        e = slab_entry(cmin, cmax, o[sl], d[sl])
        return e, hitcl_all[sl], thit_all[sl]

    cache = {}

    def get(ti):
        if ti not in cache:
            cache[ti] = tile_data(int(ti))
        return cache[ti]

    # Baseline K=1
    tot_sv = tot_it = 0
    for ti in pick:
        e, hc, th = get(ti)
        sv, it = sim_group([e], [hc], [th])
        tot_sv += sv; tot_it += it
    n = len(pick)
    print(f"K=1 baseline     : sv/tile {tot_sv/n:6.2f} it/tile {tot_it/n:6.2f}"
          f"  (TPU measured: 15.75 / 16.60)")

    for K in (2, 4):
        for mode in ("contig", "strided"):
            tot_sv = tot_it = 0
            cnt = 0
            for ti in pick[::K]:
                if mode == "contig":
                    group = [ti + k for k in range(K)]
                else:
                    group = [ti + k * (T // K) for k in range(K)]
                group = [g for g in group if g < T]
                if len(group) < K:
                    continue
                es, hcs, ths = zip(*(get(g) for g in group))
                sv, it = sim_group(list(es), list(hcs), list(ths))
                tot_sv += sv; tot_it += it
                cnt += 1
            # per SERVED TILE (group serves K tiles)
            print(f"K={K} {mode:7s}     : sv/tile {tot_sv/cnt/K:6.2f} "
                  f"it/tile {tot_it/cnt/K:6.2f}   ({cnt} groups)")


if __name__ == "__main__":
    main()
