"""int8 vs bf16 packed 2-NN kernel on hardware + tile sweep."""

import time

import numpy as np
import jax
import jax.numpy as jnp

from imageanalysis_tpu.ops import knn

N_PAD = 6144
DIM = 128
BATCH = 64
STEPS = 32

rng = np.random.default_rng(0)
a8 = rng.integers(0, 256, (BATCH, N_PAD, DIM)).astype(np.uint8)
b8 = rng.integers(0, 256, (BATCH, N_PAD, DIM)).astype(np.uint8)
ai = jnp.asarray((a8.astype(np.int16) - 128).astype(np.int8))
bi = jnp.asarray((b8.astype(np.int16) - 128).astype(np.int8))
af = jnp.asarray(a8.astype(np.float32))
bf = jnp.asarray(b8.astype(np.float32))


def bench(name, fn, *args):
    try:
        out = fn(*args)
        float(jnp.sum(out))
        t0 = time.perf_counter()
        outs = [fn(*args) for _ in range(STEPS)]
        s = 0.0
        for o in outs:
            s += float(jnp.sum(o))
        dt = time.perf_counter() - t0
        print(f"{name}: {BATCH*STEPS/dt:.0f} pairs/s ({dt/STEPS*1000:.1f} ms/batch)")
    except Exception as e:
        print(f"{name}: FAILED {type(e).__name__}: {str(e)[:200]}")


def make(fn_kind, ta, tb):
    @jax.jit
    def run(a, b):
        def one(x, y):
            rd, ri, cd, ci = knn.knn_top2(x, y, tile_a=ta, tile_b=tb)
            return jnp.sum(ri[:, 0]) + jnp.sum(ci)
        return jax.vmap(one)(a, b)
    return run

for ta, tb in ((256, 6144), (128, 6144), (512, 6144), (256, 3072),
               (256, 2048), (128, 2048)):
    bench(f"int8 packed ta={ta} tb={tb}", make("i8", ta, tb), ai, bi)

bench("bf16 packed ta=256 tb=6144 (r2 default)", make("bf", 256, 6144), af, bf)
