#!/bin/bash
# One-shot TPU validation of the outage-era commits (run when the tunnel is
# back). Order per CLAUDE.md: tiny jit -> bench -> courtyard sanity.
set -x
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/.jax_cache

# 1. Tiny jit (tunnel health).
timeout 300 python -u -c "
import jax, jax.numpy as jnp
print('devices', jax.devices())
print('tiny jit', float(jax.jit(lambda a: (a*2+1).sum())(jnp.arange(16.0))))
" || exit 1

# 2. Fused-regen kernel smoke at bench shape prefix (small spp first so a
#    Mosaic legality failure surfaces in minutes, not after a 7-min compile
#    of the full bench program).
timeout 1800 env RAYFINDER_BENCH_SAMPLES=4 python -u bench.py || exit 2

# 3. Full bench.
timeout 3600 python -u bench.py || exit 3

# 4. Courtyard sanity render (walk kernels changed): 720p few-spp.
timeout 3600 python -u prof/courtyard_sanity.py || exit 4
echo ALL_OK
