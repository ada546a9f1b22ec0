"""Separate per-dispatch overhead from per-pair kernel compute.

1. no-op dispatch floor: tiny jit, N back-to-back enqueues, one sync.
2. batch sweep of the real full match kernel: time(B) for B in 8..256;
   slope = per-pair device compute, intercept = dispatch overhead.
"""

import time

import numpy as np
import jax
import jax.numpy as jnp

from imageanalysis_tpu.match.matcher import match_pair_batch

N_PAD = 6144
DIM = 128
STEPS = 24

rng = np.random.default_rng(0)


@jax.jit
def noop(x):
    return x + 1.0


x = jnp.zeros((8, 128), jnp.float32)
float(jnp.sum(noop(x)))
t0 = time.perf_counter()
outs = [noop(x) for _ in range(64)]
for o in outs:
    float(jnp.sum(o))
dt = time.perf_counter() - t0
print(f"no-op dispatch+sync x64: {dt/64*1000:.2f} ms each")

# enqueue-only (sync once at end)
t0 = time.perf_counter()
outs = [noop(x) for _ in range(64)]
float(jnp.sum(outs[-1]))
dt = time.perf_counter() - t0
print(f"no-op dispatch, single sync: {dt/64*1000:.2f} ms each")

K = jnp.asarray(np.array([[3000.0, 0, 2000], [0, 3000.0, 1500],
                          [0, 0, 1]], np.float32))

for B in (8, 32, 64, 128, 256):
    da = jnp.asarray(rng.uniform(0, 255, (B, N_PAD, DIM)).astype(np.float32))
    db = jnp.asarray(rng.uniform(0, 255, (B, N_PAD, DIM)).astype(np.float32))
    ua = jnp.asarray(rng.uniform(0, 4000, (B, N_PAD, 2)).astype(np.float32))
    ub = ua * 1.01
    na = jnp.full(B, 6000, jnp.int32)
    keys = jax.random.split(jax.random.PRNGKey(0), B)

    def fn():
        return match_pair_batch(da, db, ua, ub, na, na, keys, K,
                                ratio=0.75, thresh=7.9,
                                transform="homography", n_hyp=512,
                                use_pallas=True, bf16=True)

    out = fn()
    float(jnp.sum(out[1]))
    steps = max(4, 2048 // B)
    t0 = time.perf_counter()
    outs = [fn() for _ in range(steps)]
    for o in outs:
        float(jnp.sum(o[1]))
    dt = (time.perf_counter() - t0) / steps
    print(f"B={B}: {dt*1000:.1f} ms/batch  {B/dt:.0f} pairs/s "
          f"({dt/B*1000:.2f} ms/pair)")
