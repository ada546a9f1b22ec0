"""Stage-level profile of the bench.py match pipeline on hardware.

Protocol (env-facts): chain a dependent scalar on device per step, download
ONCE at the end — per-step downloads serialize ~34 ms RTTs and pollute
stage attribution.

Variants timed at bench shapes (B=64, npad=6144, n=6000):
  knn      — knn_top2 packed kernel only
  dense    — + ratio test + mutual cross-check (match_pair_dense)
  full     — + homography RANSAC, current defaults (n_hyp=512, sp=1024)
  full-spN — RANSAC score_points sweep
  full-hN  — RANSAC n_hyp sweep
"""
import time
import numpy as np
import jax
import jax.numpy as jnp
import functools

from imageanalysis_tpu.ops import knn, ransac
from imageanalysis_tpu.match.matcher import match_pair_batch

print("backend:", jax.default_backend(), flush=True)

N_FEAT, N_PAD, DIM, BATCH = 6000, 6144, 128, 64
STEPS = 16
rng = np.random.default_rng(0)
desc_a = rng.uniform(0, 360, (BATCH, N_PAD, DIM)).astype(np.float32)
desc_b = rng.uniform(0, 360, (BATCH, N_PAD, DIM)).astype(np.float32)
desc_a[:, N_FEAT:] = knn.PAD_VALUE
desc_b[:, N_FEAT:] = knn.PAD_VALUE
desc_b[:, :1500] = desc_a[:, :1500] + rng.normal(0, 4, (BATCH, 1500, DIM)).astype(np.float32)
uv_a = rng.uniform(0, 4000, (BATCH, N_PAD, 2)).astype(np.float32)
uv_b = (uv_a * np.array([1.02, 0.98]) + np.array([25.0, -40.0])
        + rng.normal(0, 0.5, uv_a.shape)).astype(np.float32)
n_a = jnp.full(BATCH, N_FEAT, jnp.int32)
n_b = jnp.full(BATCH, N_FEAT, jnp.int32)
K = jnp.asarray(np.array([[3000.0, 0, 2000], [0, 3000.0, 1500], [0, 0, 1]], np.float32))
da, db, ua, ub = (jnp.asarray(x) for x in (desc_a, desc_b, uv_a, uv_b))
keys = jax.random.split(jax.random.PRNGKey(0), BATCH)


@jax.jit
def knn_only(da, db):
    def one(a, b):
        rd, ri, cd, ci = knn.knn_top2(a, b, bf16=True)
        return jnp.sum(ri[:, 0]) + jnp.sum(ci)
    return jnp.sum(jax.vmap(one)(da, db))


@jax.jit
def dense_only(da, db):
    def one(a, b):
        bj, ok = knn.match_pair_dense(a, b, N_FEAT, N_FEAT, ratio=0.75,
                                      use_pallas=True, bf16=True)
        return jnp.sum(jnp.where(ok, bj, 0))
    return jnp.sum(jax.vmap(one)(da, db))


def full(n_hyp, sp):
    @jax.jit
    def f(da, db, ua, ub, keys):
        def one(a, b, x, y, key):
            bj, ok = knn.match_pair_dense(a, b, N_FEAT, N_FEAT, ratio=0.75,
                                          use_pallas=True, bf16=True)
            pb = jnp.take_along_axis(y, bj[:, None], axis=0)
            res = ransac.ransac_homography(key, x, pb, ok, thresh=7.9,
                                           n_hyp=n_hyp, score_points=sp)
            ok = ok & res.inliers & res.ok
            return jnp.sum(jnp.where(ok, bj, 0)), jnp.sum(ok)
        s, nok = jax.vmap(one)(da, db, ua, ub, keys)
        return jnp.sum(s), jnp.sum(nok)
    return f


def timeit(name, fn, *args, steps=STEPS):
    # warm/compile
    out = fn(*args)
    acc = jnp.sum(jnp.asarray(jax.tree.leaves(out)[0]))
    float(acc)
    t0 = time.perf_counter()
    accs = []
    for s in range(steps):
        out = fn(*args)
        accs.append(jnp.asarray(jax.tree.leaves(out)[0]).astype(jnp.float64)
                    if False else jax.tree.leaves(out)[0])
    # one chained download
    total = float(functools.reduce(lambda x, y: x + y,
                                   [jnp.sum(a) for a in accs]))
    dt = time.perf_counter() - t0
    print(f"{name}: {dt/steps*1000:.2f} ms/batch -> "
          f"{BATCH*steps/dt:.0f} pairs/s (chk {total:.3g})", flush=True)
    return dt / steps


t_knn = timeit("knn", knn_only, da, db)
t_dense = timeit("dense", dense_only, da, db)
for n_hyp, sp in ((512, 1024), (512, 512), (512, 256), (256, 1024),
                  (256, 512), (1024, 512)):
    f = full(n_hyp, sp)
    # report inlier count to confirm quality holds across the sweep
    out = f(da, db, ua, ub, keys)
    nok = float(out[1]) / BATCH
    t = timeit(f"full-h{n_hyp}-sp{sp}", f, da, db, ua, ub, keys)
    print(f"   inliers/pair: {nok:.0f}", flush=True)
print("DONE")
