"""Post-RANSAC-fix split with chained-sum sync (single download)."""

import time

import numpy as np
import jax
import jax.numpy as jnp

from imageanalysis_tpu.ops import knn, ransac
from imageanalysis_tpu.match.matcher import match_pair_batch

N_PAD = 6144
DIM = 128
BATCH = 64
STEPS = 32

rng = np.random.default_rng(0)
da = jnp.asarray(rng.uniform(0, 255, (BATCH, N_PAD, DIM)).astype(np.float32))
db = jnp.asarray(rng.uniform(0, 255, (BATCH, N_PAD, DIM)).astype(np.float32))
ua = jnp.asarray(rng.uniform(0, 4000, (BATCH, N_PAD, 2)).astype(np.float32))
ub = ua * 1.01
na = jnp.full(BATCH, 6000, jnp.int32)
K = jnp.asarray(np.array([[3000.0, 0, 2000], [0, 3000.0, 1500],
                          [0, 0, 1]], np.float32))
keys = jax.random.split(jax.random.PRNGKey(0), BATCH)


def timeit(name, fn):
    acc = fn()
    float(acc)
    t0 = time.perf_counter()
    acc = jnp.zeros(())
    for _ in range(STEPS):
        acc = acc + fn()
    float(acc)   # one download forces the whole chain
    dt = (time.perf_counter() - t0) / STEPS
    print(f"{name}: {dt*1000:.1f} ms/batch  {BATCH/dt:.0f} pairs/s")


@jax.jit
def knn_only(a, b):
    def one(x, y):
        rd, ri, cd, ci = knn.knn_top2(x, y, bf16=True)
        return jnp.sum(ri[:, 0]) + jnp.sum(ci)
    return jnp.sum(jax.vmap(one)(a, b)).astype(jnp.float32)


@jax.jit
def dense_only(a, b, n1, n2):
    def one(x, y, u, v):
        bj, ok = knn.match_pair_dense(x, y, u, v, use_pallas=True, bf16=True)
        return jnp.sum(bj) + jnp.sum(ok)
    return jnp.sum(jax.vmap(one)(a, b, n1, n2)).astype(jnp.float32)


@jax.jit
def ransac_only(k, u1, u2):
    def one(key, x, y):
        ok = jnp.ones(x.shape[0], bool)
        res = ransac.ransac_homography(key, x, y, ok, thresh=7.9, n_hyp=512)
        return jnp.sum(res.inliers)
    return jnp.sum(jax.vmap(one)(k, u1, u2)).astype(jnp.float32)


def full():
    bj, ok = match_pair_batch(da, db, ua, ub, na, na, keys, K,
                              ratio=0.75, thresh=7.9, transform="homography",
                              n_hyp=512, use_pallas=True, bf16=True)
    return jnp.sum(ok).astype(jnp.float32)


timeit("knn_top2 only", lambda: knn_only(da, db))
timeit("dense (knn+ratio+mutual)", lambda: dense_only(da, db, na, na))
timeit("ransac_homography only", lambda: ransac_only(keys, ua, ub))
timeit("full match_pair_batch", full)
