"""Re-sweep packed-kernel tile sizes with the chained-sum protocol.

The r2 sweep that picked tile_b = n_b (whole-B blocks) used per-output
syncs, which this runtime pollutes with a ~34 ms serialized RTT per
download — its conclusion is suspect. A 256x6144 block keeps ~19-25 MB
of int32/f32 temporaries live (d2, f32 copy, rowkey, masked) and likely
spills VMEM; smaller B tiles pipeline fetch/compute across ib steps.
"""

import time
import sys

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from imageanalysis_tpu.ops import knn

N_FEAT = 6000
N_PAD = 6144
DIM = 128
BATCH = 64
STEPS = 32

rng = np.random.default_rng(0)
desc_a = rng.integers(0, 100, (BATCH, N_PAD, DIM)).astype(np.float32)
desc_b = rng.integers(0, 100, (BATCH, N_PAD, DIM)).astype(np.float32)
desc_b[:, :1500] = np.clip(np.round(
    desc_a[:, :1500] + rng.normal(0, 4, (BATCH, 1500, DIM))), 0, 255)
desc_a[:, N_FEAT:] = 255.0
desc_b[:, N_FEAT:] = 255.0
ai = jnp.asarray((desc_a.astype(np.int16) - 128).astype(np.int8))
bi = jnp.asarray((desc_b.astype(np.int16) - 128).astype(np.int8))
abf = jnp.asarray(desc_a).astype(jnp.bfloat16)
bbf = jnp.asarray(desc_b).astype(jnp.bfloat16)


def timeit(name, fn, *args):
    try:
        acc = fn(*args, 0)
        float(acc)
    except Exception as e:
        print(f"{name}: FAIL {str(e)[:90]}")
        return
    acc = jnp.zeros((), jnp.float32)
    for s in range(4):
        acc = acc + fn(*args, s)
    float(acc)
    t0 = time.perf_counter()
    acc = jnp.zeros((), jnp.float32)
    for s in range(STEPS):
        acc = acc + fn(*args, s)
    float(acc)
    dt = time.perf_counter() - t0
    print(f"{name}: {dt/STEPS*1000:.2f} ms/batch ({BATCH*STEPS/dt:.0f} pairs/s)")


def make(ta, tb):
    @jax.jit
    def run(a, b, salt):
        def one(x, y):
            rd, ri, cd, ci = knn.knn_top2(x, y, tile_a=ta, tile_b=tb)
            return jnp.sum(ri) + jnp.sum(ci)
        out = jax.vmap(one)(a, b)
        return jnp.sum(out).astype(jnp.float32) * 0 + salt
    return run


for ta in (128, 256, 512):
    for tb in (512, 1024, 2048, 3072, 6144):
        timeit(f"int8 {ta:4d}x{tb:5d}", make(ta, tb), ai, bi)

timeit("bf16  256x 6144", make(256, 6144), abf, bbf)
timeit("bf16  256x 1024", make(256, 1024), abf, bbf)
