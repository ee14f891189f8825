"""Gather microbenchmarks: how does TPU gather cost scale with row width,
table size, and lowering (row vs element)? 480K indices, like shading."""
import os, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
import numpy as np
import jax, jax.numpy as jnp

B = 480000
T = 4212
REPS = 50
key = jax.random.PRNGKey(0)
idx = jax.random.randint(key, (B,), 0, T, dtype=jnp.int32)
tbl25 = jax.random.normal(key, (T, 25), jnp.float32)
tbl9 = tbl25[:, :9]
tbl1 = tbl25[:, 0]
tblT25 = tbl25.T.copy()  # (25, T)
big1 = jax.random.normal(key, (262144,), jnp.float32)
idx_big = jax.random.randint(key, (B,), 0, 262144, dtype=jnp.int32)

fence = jax.jit(lambda a: jnp.sum(a))

def timed(name, fn, *args):
    r = fn(*args); float(fence(r))
    t0 = time.time(); r = fn(*args); float(fence(r))
    print(f"{name:22s} {(time.time()-t0)/REPS*1e3:8.3f} ms")

def scan(body):
    @jax.jit
    def run(idx):
        def step(c, _):
            out = body(c)
            c = (c + jnp.int32(out.reshape(-1)[0] * 0) + 1) % T
            return c, None
        c, _ = jax.lax.scan(step, idx, jnp.arange(REPS))
        return c
    return run

timed("row (B,25) T=4212", scan(lambda i: tbl25[i]), idx)
timed("row (B,9)  T=4212", scan(lambda i: tbl9[i]), idx)
timed("row (B,1)~elem    ", scan(lambda i: tbl1[i]), idx)
timed("elem x9 from (9,T)", scan(lambda i: sum(tblT25[c][i] for c in range(9))), idx)
timed("elem (B,) T=262144", scan(lambda i: big1[i % 262144]), idx_big)
timed("onehot matmul bf16", scan(
    lambda i: (jax.nn.one_hot(i % 512, 512, dtype=jnp.bfloat16)
               @ tbl25[:512].astype(jnp.bfloat16)).astype(jnp.float32)), idx)
