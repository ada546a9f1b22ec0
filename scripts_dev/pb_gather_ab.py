"""A/B: matched-coordinate gather formulations in the full match pipe
(dense one-hot mutual epilogue + RANSAC), barrier in both:
  tala    — take_along_axis gather of uv_b
  onehot  — gather_matched_uv (expects CSE with the mutual one-hot)
Run each 3x interleaved to separate signal from tunnel noise."""

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
ai = jnp.asarray((desc_a.astype(np.int16) - 128).astype(np.int8))
bi = jnp.asarray((desc_b.astype(np.int16) - 128).astype(np.int8))
uv_a = rng.uniform(0, 4000, (BATCH, N_PAD, 2)).astype(np.float32)
uv_b = (uv_a * np.array([1.02, 0.98]) + np.array([25.0, -40.0])
        + rng.normal(0, 0.5, uv_a.shape)).astype(np.float32)
jua, jub = jnp.asarray(uv_a), jnp.asarray(uv_b)
keys = jax.random.split(jax.random.PRNGKey(0), BATCH)


def make(form):
    @jax.jit
    def run(a, b, ua, ub, ks, salt):
        def one(x, y, pa, pbt, k):
            bj, ok = knn.match_pair_dense(x, y, N_FEAT, N_FEAT,
                                          use_pallas=True)
            if form == "tala":
                pb = jnp.take_along_axis(pbt, bj[:, None], axis=0)
            else:
                pb = knn.gather_matched_uv(pbt, bj)
            pb, ok = jax.lax.optimization_barrier((pb, ok))
            res = ransac.ransac_homography(k, pa, pb, ok, thresh=7.9,
                                           n_hyp=512)
            return jnp.sum(ok & res.inliers & res.ok)
        out = jax.vmap(one)(a, b, ua, ub, ks)
        return jnp.sum(out).astype(jnp.float32) * 0 + salt
    return run


fns = {"tala  ": make("tala"), "onehot": make("onehot")}
for name, fn in fns.items():
    acc = fn(ai, bi, jua, jub, keys, 0)
    float(acc)

for rep in range(3):
    for name, fn in fns.items():
        acc = jnp.zeros((), jnp.float32)
        for s in range(4):
            acc = acc + fn(ai, bi, jua, jub, keys, s)
        float(acc)
        t0 = time.perf_counter()
        acc = jnp.zeros((), jnp.float32)
        for s in range(STEPS):
            acc = acc + fn(ai, bi, jua, jub, keys, s)
        float(acc)
        dt = time.perf_counter() - t0
        print(f"rep{rep} {name}: {dt/STEPS*1000:.2f} ms/batch "
              f"({BATCH*STEPS/dt:.0f} pairs/s)")
