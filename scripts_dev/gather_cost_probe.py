"""Isolate the pb = take_along_axis(ub, best_j) cost in match_pair_batch:
full-pipe minus (dense + ransac) was ~11 ms/64-pair batch. Compare gather
formulations. Chained-sum sync protocol."""

import time
import sys

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from imageanalysis_tpu.ops import knn, ransac

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
keys = jax.random.split(jax.random.PRNGKey(0), BATCH)


def timeit(name, fn, *args):
    acc = fn(*args, 0)
    float(acc)
    # burn one timed loop shape: first measured loop in a process pays a
    # one-time ~700 ms stall; do a throwaway loop first
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


def dense(da, db):
    def one(x, y):
        return knn.match_pair_dense(x, y, N_FEAT, N_FEAT, use_pallas=True)
    return jax.vmap(one)(da, db)


@jax.jit
def dense_only(a, b, salt):
    bj, ok = dense(a, b)
    return jnp.sum(ok).astype(jnp.float32) * 0 + salt


@jax.jit
def dense_gather_tala(a, b, ub, salt):
    bj, ok = dense(a, b)
    pb = jnp.take_along_axis(ub, bj[..., None], axis=1)
    return (jnp.sum(ok) + jnp.sum(pb)).astype(jnp.float32) * 0 + salt


@jax.jit
def dense_gather_1d(a, b, ub, salt):
    bj, ok = dense(a, b)
    def g(u, j):
        return jnp.stack([u[:, 0][j], u[:, 1][j]], axis=-1)
    pb = jax.vmap(g)(ub, bj)
    return (jnp.sum(ok) + jnp.sum(pb)).astype(jnp.float32) * 0 + salt


@jax.jit
def full(a, b, ua, ub, ks, salt):
    bj, ok = dense(a, b)
    pb = jnp.take_along_axis(ub, bj[..., None], axis=1)
    def r(k, xa, xb, v):
        res = ransac.ransac_homography(k, xa, xb, v, thresh=7.9, n_hyp=512)
        return v & res.inliers & res.ok
    ok = jax.vmap(r)(ks, ua, pb, ok)
    return jnp.sum(ok).astype(jnp.float32) * 0 + salt


@jax.jit
def full_1d(a, b, ua, ub, ks, salt):
    bj, ok = dense(a, b)
    def g(u, j):
        return jnp.stack([u[:, 0][j], u[:, 1][j]], axis=-1)
    pb = jax.vmap(g)(ub, bj)
    def r(k, xa, xb, v):
        res = ransac.ransac_homography(k, xa, xb, v, thresh=7.9, n_hyp=512)
        return v & res.inliers & res.ok
    ok = jax.vmap(r)(ks, ua, pb, ok)
    return jnp.sum(ok).astype(jnp.float32) * 0 + salt


timeit("dense only              ", dense_only, ai, bi)
timeit("dense + gather (tala)   ", dense_gather_tala, ai, bi, jub)
timeit("dense + gather (2x 1-D) ", dense_gather_1d, ai, bi, jub)
timeit("full (tala gather)      ", full, ai, bi, jua, jub, keys)
timeit("full (2x 1-D gather)    ", full_1d, ai, bi, jua, jub, keys)


@jax.jit
def full_barrier(a, b, ua, ub, ks, salt):
    bj, ok = dense(a, b)
    pb = jnp.take_along_axis(ub, bj[..., None], axis=1)
    pb, ok = jax.lax.optimization_barrier((pb, ok))
    def r(k, xa, xb, v):
        res = ransac.ransac_homography(k, xa, xb, v, thresh=7.9, n_hyp=512)
        return v & res.inliers & res.ok
    ok = jax.vmap(r)(ks, ua, pb, ok)
    return jnp.sum(ok).astype(jnp.float32) * 0 + salt


@jax.jit
def ransac_realistic(ua, ub, ks, ok0, salt):
    """RANSAC standalone but with a data-dependent valid mask + materialized
    pb (is the standalone 10.5 ms an artifact of the constant mask?)."""
    def r(k, xa, xb, v):
        res = ransac.ransac_homography(k, xa, xb, v, thresh=7.9, n_hyp=512)
        return v & res.inliers & res.ok
    ok = jax.vmap(r)(ks, ua, ub, ok0)
    return jnp.sum(ok).astype(jnp.float32) * 0 + salt


ok0 = jnp.asarray(rng.random((BATCH, N_PAD)) < 0.2)
timeit("full (barrier pb)       ", full_barrier, ai, bi, jua, jub, keys)
timeit("ransac (random mask)    ", ransac_realistic, jua, jub, keys, ok0)
