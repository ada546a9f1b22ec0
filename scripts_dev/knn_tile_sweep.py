"""Sweep knn_top2 pallas tile sizes on TPU (forced-sync timing)."""
import time

import numpy as np
import jax
import jax.numpy as jnp

from imageanalysis_tpu.ops import knn

N = 6144
BATCH = 16
rng = np.random.default_rng(0)
a = jnp.asarray(rng.uniform(0, 360, (BATCH, N, 128)).astype(np.float32))
b = jnp.asarray(rng.uniform(0, 360, (BATCH, N, 128)).astype(np.float32))
print("backend:", jax.default_backend(), flush=True)


def bench(tile_a, tile_b, batch=BATCH, steps=4):
    @jax.jit
    def run(a, b):
        def one(aa, bb):
            rd, ri, cd, ci = knn.knn_top2(aa, bb, tile_a=tile_a,
                                          tile_b=tile_b, bf16=True)
            return jnp.sum(rd) + jnp.sum(cd)
        return jnp.sum(jax.vmap(one)(a, b))
    try:
        _ = float(run(a, b))
        t0 = time.perf_counter()
        for _ in range(steps):
            _ = float(run(a, b))
        dt = (time.perf_counter() - t0) / steps
        print(f"tile {tile_a:5d}x{tile_b:5d}: {dt/batch*1000:7.3f} ms/pair "
              f"({batch/dt:8.1f} pairs/s)", flush=True)
    except Exception as e:
        print(f"tile {tile_a:5d}x{tile_b:5d}: FAILED {type(e).__name__} "
              f"{str(e)[:120]}", flush=True)


for ta, tb in [(256, 1024), (256, 2048), (512, 1024), (512, 2048),
               (1024, 1024), (256, 6144), (512, 6144), (1024, 2048),
               (2048, 2048), (128, 6144)]:
    if N % ta == 0 and N % tb == 0:
        bench(ta, tb)
