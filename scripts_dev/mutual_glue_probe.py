"""The dense stage costs 17.6 ms/64-batch but knn_top2 alone is 12.3:
~5.3 ms of ratio/mutual glue. Suspects: the col_i[best_j] mutual gather
(6144-from-6144) and XLA re-fusing the packed decode into consumers.

Variants of match_pair_dense's epilogue:
  A. current (plain gather)
  B. barrier after knn outputs, then gather
  C. barrier + mutual via one-hot matmul over the packed column keys
"""

import time
import sys

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from imageanalysis_tpu.ops import knn

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


def timeit(name, fn, *args):
    acc = fn(*args, 0)
    float(acc)
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


RATIO2 = 0.75 * 0.75


def epilogue(row_d, row_i, col_d, col_i, n_a, n_b, variant):
    n_a_pad = row_d.shape[0]
    if variant != "A":
        row_d, row_i, col_d, col_i = jax.lax.optimization_barrier(
            (row_d, row_i, col_d, col_i))
    arange_a = jnp.arange(n_a_pad, dtype=jnp.int32)
    best_j = row_i[:, 0]
    d1 = jnp.maximum(row_d[:, 0], 0.0)
    d2 = jnp.maximum(row_d[:, 1], 0.0)
    ok = d1 < RATIO2 * d2
    if variant == "C":
        oh = (best_j[:, None]
              == jnp.arange(col_i.shape[0], dtype=jnp.int32)[None, :]
              ).astype(jnp.float32)
        back = (oh @ col_i.astype(jnp.float32)).astype(jnp.int32)
        ok &= back == arange_a
    else:
        ok &= col_i[best_j] == arange_a
    ok &= arange_a < n_a
    ok &= best_j < n_b
    return best_j, ok


def make(variant):
    @jax.jit
    def run(a, b, salt):
        def one(x, y):
            rd, ri, cd, ci = knn.knn_top2(x, y)
            bj, ok = epilogue(rd, ri, cd, ci, N_FEAT, N_FEAT, variant)
            return jnp.sum(ok) + jnp.sum(bj)
        out = jax.vmap(one)(a, b)
        return jnp.sum(out).astype(jnp.float32) * 0 + salt
    return run


for v in ("A", "B", "C"):
    timeit(f"variant {v}", make(v), ai, bi)
