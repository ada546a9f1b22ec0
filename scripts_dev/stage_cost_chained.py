"""Honest stage costs for the per-pair match pipeline: chained-sum sync
(enqueue all steps, accumulate a dependent scalar on device, download ONE
value) — per the ROUND3_NOTES measurement methodology.

Stages: knn-only, knn+ratio+mutual (match_pair_dense), full
match_pair_batch (adds uv gather + RANSAC), ransac-only.
"""

import time

import numpy as np
import jax
import jax.numpy as jnp

import sys
sys.path.insert(0, "/root/repo")

from imageanalysis_tpu.ops import knn, ransac
from imageanalysis_tpu.match.matcher import match_pair_batch

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
uv_a = rng.uniform(0, 4000, (BATCH, N_PAD, 2)).astype(np.float32)
uv_b = (uv_a * np.array([1.02, 0.98]) + np.array([25.0, -40.0])
        + rng.normal(0, 0.5, uv_a.shape)).astype(np.float32)
ai = jnp.asarray((desc_a.astype(np.int16) - 128).astype(np.int8))
bi = jnp.asarray((desc_b.astype(np.int16) - 128).astype(np.int8))
jua, jub = jnp.asarray(uv_a), jnp.asarray(uv_b)
n_a = jnp.full((BATCH,), N_FEAT, jnp.int32)
n_b = jnp.full((BATCH,), N_FEAT, jnp.int32)
K = jnp.asarray(np.array([[3000.0, 0, 2000], [0, 3000.0, 1500],
                          [0, 0, 1]], np.float32))
keys = jax.random.split(jax.random.PRNGKey(0), BATCH)


def timeit(name, fn, *args):
    """fn(*args, salt) -> scalar. Chained: acc = acc + fn(...)."""
    acc = fn(*args, 0)
    float(acc)  # warm/compile
    t0 = time.perf_counter()
    acc = jnp.zeros((), jnp.float32)
    for s in range(STEPS):
        acc = acc + fn(*args, s)
    v = float(acc)
    dt = time.perf_counter() - t0
    print(f"{name}: {dt/STEPS*1000:.2f} ms/batch ({BATCH*STEPS/dt:.0f} "
          f"pairs/s)  [chk {v:.3g}]")
    return dt / STEPS


@jax.jit
def knn_only(a, b, salt):
    def one(x, y):
        row_d, row_i, col_d, col_i = knn.knn_top2(x, y)
        return jnp.sum(row_d[:, 0]) + jnp.sum(col_i % 7)
    return jnp.sum(jax.vmap(one)(a, b)) * 0 + salt


@jax.jit
def dense_only(a, b, salt):
    def one(x, y):
        bj, ok = knn.match_pair_dense(x, y, N_FEAT, N_FEAT, use_pallas=True)
        return jnp.sum(ok) + jnp.sum(bj % 5)
    return jnp.sum(jax.vmap(one)(a, b)).astype(jnp.float32) * 0 + salt


@jax.jit
def full_pipe(a, b, ua, ub, ks, salt):
    bj, ok = match_pair_batch(a, b, ua, ub, n_a, n_b, ks, K,
                              ratio=0.75, thresh=7.9, transform="homography",
                              n_hyp=512, use_pallas=True, bf16=True)
    return jnp.sum(ok).astype(jnp.float32) * 0 + salt


@jax.jit
def ransac_only(ua, ub, ks, salt):
    def one(pa, pb, k):
        valid = jnp.arange(N_PAD) < 1500
        r = ransac.ransac_homography(k, pa, pb, valid, thresh=7.9, n_hyp=512)
        return r.n_inliers
    return jnp.sum(jax.vmap(one)(ua, ub, ks)).astype(jnp.float32) * 0 + salt


timeit("knn_top2 only           ", knn_only, ai, bi)
timeit("knn + ratio + mutual    ", dense_only, ai, bi)
timeit("ransac_homography only  ", ransac_only, jua, jub, keys)
timeit("full match_pair_batch   ", full_pipe, ai, bi, jua, jub, keys)
