"""Full match_pair_batch: int8 store path vs f32/bf16, plus knn-only and
ransac-only timings under the SAME input regime as bench.py (chained-sync)."""
import time

import numpy as np
import jax
import jax.numpy as jnp

from imageanalysis_tpu.match.matcher import match_pair_batch
from imageanalysis_tpu.ops import knn, ransac

N_FEAT, N_PAD, DIM, BATCH, STEPS, PLANTED = 6000, 6144, 128, 64, 32, 1500

rng = np.random.default_rng(0)
desc_a = rng.integers(0, 100, (BATCH, N_PAD, DIM)).astype(np.float32)
desc_b = rng.integers(0, 100, (BATCH, N_PAD, DIM)).astype(np.float32)
desc_b[:, :PLANTED] = np.clip(
    np.round(desc_a[:, :PLANTED] + rng.normal(0, 4, (BATCH, PLANTED, DIM))),
    0, 255)
desc_a[:, N_FEAT:] = 255.0
desc_b[:, N_FEAT:] = 255.0
uv_a = rng.uniform(0, 4000, (BATCH, N_PAD, 2)).astype(np.float32)
uv_b = (uv_a * np.array([1.02, 0.98]) + np.array([25.0, -40.0])
        + rng.normal(0, 0.5, uv_a.shape)).astype(np.float32)
n_a = jnp.full(BATCH, N_FEAT, jnp.int32)
n_b = jnp.full(BATCH, N_FEAT, jnp.int32)
K = jnp.asarray(np.array([[3000.0, 0, 2000], [0, 3000.0, 1500], [0, 0, 1]],
                         np.float32))
keys = jax.random.split(jax.random.PRNGKey(0), BATCH)

di8_a = jnp.asarray((desc_a.astype(np.int16) - 128).astype(np.int8))
di8_b = jnp.asarray((desc_b.astype(np.int16) - 128).astype(np.int8))
df_a, df_b = jnp.asarray(desc_a), jnp.asarray(desc_b)
ua, ub = jnp.asarray(uv_a), jnp.asarray(uv_b)


def bench(name, fn, *args):
    out = fn(*args)
    s = float(sum(jnp.sum(jnp.abs(o.astype(jnp.float32))) for o in
                  jax.tree_util.tree_leaves(out)))
    t0 = time.perf_counter()
    outs = []
    for _ in range(STEPS):
        outs.append(fn(*args))
    float(sum(jnp.sum(jnp.abs(o.astype(jnp.float32))) for o in
              jax.tree_util.tree_leaves(outs[-1])))
    # chain: device queue is FIFO; last result done => all done
    dt = (time.perf_counter() - t0) / STEPS
    print(f"{name:28s} {dt*1000:8.2f} ms/batch  {BATCH/dt:8.0f} pairs/s")
    return out


kw = dict(ratio=0.75, thresh=7.9, transform="homography", n_hyp=512,
          use_pallas=True, bf16=True)

import functools


@functools.partial(jax.jit, static_argnames=())
def knn_only(da, db):
    def one(a, b):
        row_d, row_i, col_d, col_i = knn.knn_top2(a, b)
        return jnp.sum(row_i) + jnp.sum(col_i)
    return jax.vmap(one)(da, db)


@functools.partial(jax.jit, static_argnames=())
def glue_only(da, db, na, nb):
    def one(a, b, xa, xb):
        bj, ok = knn.match_pair_dense(a, b, xa, xb, ratio=0.75, mutual=True,
                                      use_pallas=True)
        return jnp.sum(bj) + jnp.sum(ok)
    return jax.vmap(one)(da, db, na, nb)


@functools.partial(jax.jit, static_argnames=())
def ransac_only(ua_, ub_, valid, ks):
    def one(xa, xb, v, k):
        res = ransac.ransac_homography(k, xa, xb, v, thresh=7.9, n_hyp=512)
        return res.n_inliers
    return jax.vmap(one)(ua_, ub_, valid, ks)


bench("knn int8", knn_only, di8_a, di8_b)
bench("knn bf16(f32 in)", knn_only, df_a, df_b)
bench("knn+glue int8", glue_only, di8_a, di8_b, n_a, n_b)
bench("knn+glue bf16", glue_only, df_a, df_b, n_a, n_b)
valid = np.zeros((BATCH, N_PAD), bool)
valid[:, :2000] = True
bench("ransac only", ransac_only, ua, ub, jnp.asarray(valid), keys)
bench("full int8", match_pair_batch, di8_a, di8_b, ua, ub, n_a, n_b,
      keys, K, 0.75, 7.9, "homography", 512, True, True)
bench("full bf16", match_pair_batch, df_a, df_b, ua, ub, n_a, n_b,
      keys, K, 0.75, 7.9, "homography", 512, True, True)
