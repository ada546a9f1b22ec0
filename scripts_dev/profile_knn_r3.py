"""Round-3 profile: where does the per-pair device time go?

Times (on the real chip, scalar-download sync):
  1. knn_top2 packed kernel alone (bf16)
  2. match_pair_dense (knn + ratio + mutual)
  3. match_pair_batch full (.. + homography RANSAC n_hyp=512)
at batch 64, 6144 features, to find the optimization target for the
>=3000 pairs/s goal.
"""

import time

import numpy as np
import jax
import jax.numpy as jnp

from imageanalysis_tpu.ops import knn
from imageanalysis_tpu.match.matcher import match_pair_batch

N_PAD = 6144
DIM = 128
BATCH = 64
STEPS = 32

rng = np.random.default_rng(0)
desc_a = rng.uniform(0, 255, (BATCH, N_PAD, DIM)).astype(np.float32)
desc_b = rng.uniform(0, 255, (BATCH, N_PAD, DIM)).astype(np.float32)
desc_b[:, :1500] = desc_a[:, :1500] + rng.normal(0, 4, (BATCH, 1500, DIM))
uv_a = rng.uniform(0, 4000, (BATCH, N_PAD, 2)).astype(np.float32)
uv_b = (uv_a * np.array([1.02, 0.98]) + np.array([25.0, -40.0])).astype(np.float32)
n_a = np.full(BATCH, 6000, np.int32)
n_b = np.full(BATCH, 6000, np.int32)
K = jnp.asarray(np.array([[3000.0, 0, 2000], [0, 3000.0, 1500],
                          [0, 0, 1]], np.float32))

da, db = jnp.asarray(desc_a), jnp.asarray(desc_b)
ua, ub = jnp.asarray(uv_a), jnp.asarray(uv_b)
naj, nbj = jnp.asarray(n_a), jnp.asarray(n_b)
keys = jax.random.split(jax.random.PRNGKey(0), BATCH)


def force(x):
    return float(jnp.sum(jnp.asarray(x, jnp.float32)))


def timeit(name, fn, sync):
    out = fn()
    sync(out)
    t0 = time.perf_counter()
    outs = [fn() for _ in range(STEPS)]
    sync(outs[-1])
    # sync on every output's dependency chain
    for o in outs:
        sync(o)
    dt = time.perf_counter() - t0
    print(f"{name}: {BATCH*STEPS/dt:.0f} pairs/s ({dt/STEPS*1000:.1f} ms/batch)")
    return BATCH * STEPS / dt


# 1. raw kernel, vmapped over batch
@jax.jit
def knn_only(a, b):
    def one(x, y):
        rd, ri, cd, ci = knn.knn_top2(x, y, bf16=True)
        return rd[:, 0].sum() + ri[:, 0].sum() + cd.sum()
    return jax.vmap(one)(a, b)

timeit("knn_top2 packed (bf16)", lambda: knn_only(da, db), force)


# 2. knn + ratio + mutual
@jax.jit
def dense_only(a, b, na, nb):
    def one(x, y, n1, n2):
        bj, ok = knn.match_pair_dense(x, y, n1, n2, use_pallas=True, bf16=True)
        return bj.sum() + ok.sum()
    return jax.vmap(one)(a, b, na, nb)

timeit("match_pair_dense", lambda: dense_only(da, db, naj, nbj), force)


# 3. full pipeline with RANSAC
def full():
    return match_pair_batch(da, db, ua, ub, naj, nbj, keys, K,
                            ratio=0.75, thresh=7.9, transform="homography",
                            n_hyp=512, use_pallas=True, bf16=True)

timeit("match_pair_batch full", lambda: force(full()[1]), lambda x: x)
