"""A/B the PRODUCTION match_pair_batch (fused uv_b one-hot in
match_pair_dense) against a tala-gather variant, interleaved reps."""

import time
import sys

import numpy as np
import jax
import jax.numpy as jnp

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
ai = jnp.asarray((desc_a.astype(np.int16) - 128).astype(np.int8))
bi = jnp.asarray((desc_b.astype(np.int16) - 128).astype(np.int8))
uv_a = rng.uniform(0, 4000, (BATCH, N_PAD, 2)).astype(np.float32)
uv_b = (uv_a * np.array([1.02, 0.98]) + np.array([25.0, -40.0])
        + rng.normal(0, 0.5, uv_a.shape)).astype(np.float32)
jua, jub = jnp.asarray(uv_a), jnp.asarray(uv_b)
keys = jax.random.split(jax.random.PRNGKey(0), BATCH)
n_a = jnp.asarray(np.full(BATCH, N_FEAT, np.int32))
n_b = jnp.asarray(np.full(BATCH, N_FEAT, np.int32))
K = jnp.asarray(np.array([[3000.0, 0, 2000], [0, 3000.0, 1500],
                          [0, 0, 1]], np.float32))


@jax.jit
def prod(a, b, ua, ub, na, nb, ks, salt):
    bj, ok = match_pair_batch.__wrapped__(
        a, b, ua, ub, na, nb, ks, K, ratio=0.75, thresh=7.9,
        transform="homography", n_hyp=512, use_pallas=True, bf16=True)
    return jnp.sum(ok).astype(jnp.float32) * 0 + salt


@jax.jit
def tala(a, b, ua, ub, na, nb, ks, salt):
    def one(x, y, pa, pbt, n1, n2, k):
        bj, ok = knn.match_pair_dense(x, y, n1, n2, ratio=0.75,
                                      use_pallas=True)
        pb = jnp.take_along_axis(pbt, bj[:, None], axis=0)
        pb, ok = jax.lax.optimization_barrier((pb, ok))
        res = ransac.ransac_homography(k, pa, pb, ok, thresh=7.9, n_hyp=512)
        return jnp.sum(ok & res.inliers & res.ok)
    out = jax.vmap(one)(a, b, ua, ub, na, nb, ks)
    return jnp.sum(out).astype(jnp.float32) * 0 + salt


fns = {"prod": prod, "tala": tala}
for name, fn in fns.items():
    float(fn(ai, bi, jua, jub, n_a, n_b, keys, 0))

for rep in range(3):
    for name, fn in fns.items():
        acc = jnp.zeros((), jnp.float32)
        for s in range(4):
            acc = acc + fn(ai, bi, jua, jub, n_a, n_b, keys, s)
        float(acc)
        t0 = time.perf_counter()
        acc = jnp.zeros((), jnp.float32)
        for s in range(STEPS):
            acc = acc + fn(ai, bi, jua, jub, n_a, n_b, keys, s)
        float(acc)
        dt = time.perf_counter() - t0
        print(f"rep{rep} {name}: {dt/STEPS*1000:.2f} ms/batch "
              f"({BATCH*STEPS/dt:.0f} pairs/s)")
