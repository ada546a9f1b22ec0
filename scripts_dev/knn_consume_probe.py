"""Why does consuming knn_top2's raw outputs time 2x slower than
match_pair_dense (which calls it)? Probe different consumption patterns
with the chained-sum protocol. Also: a true matmul-only floor."""

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
abf = jnp.asarray(desc_a, jnp.bfloat16)
bbf = jnp.asarray(desc_b, jnp.bfloat16)


def timeit(name, fn, *args):
    acc = fn(*args, 0)
    float(acc)
    t0 = time.perf_counter()
    acc = jnp.zeros((), jnp.float32)
    for s in range(STEPS):
        acc = acc + fn(*args, s)
    float(acc)
    dt = time.perf_counter() - t0
    print(f"{name}: {dt/STEPS*1000:.2f} ms/batch ({BATCH*STEPS/dt:.0f} pairs/s)")


def make(consume):
    @jax.jit
    def run(a, b, salt):
        def one(x, y):
            row_d, row_i, col_d, col_i = knn.knn_top2(x, y)
            if consume == "all":
                return (jnp.sum(row_d[:, 0]) + jnp.sum(row_i)
                        + jnp.sum(col_d) + jnp.sum(col_i))
            if consume == "row_d0":
                return jnp.sum(row_d[:, 0])
            if consume == "row_i":
                return jnp.sum(row_i).astype(jnp.float32)
            if consume == "col_i":
                return jnp.sum(col_i).astype(jnp.float32)
            if consume == "ratio":          # what dense uses
                best_j = row_i[:, 0]
                d1 = jnp.maximum(row_d[:, 0], 0.0)
                d2 = jnp.maximum(row_d[:, 1], 0.0)
                ok = d1 < 0.5625 * d2
                ok &= col_i[best_j] == jnp.arange(N_PAD)
                return jnp.sum(ok).astype(jnp.float32)
        return jnp.sum(jax.vmap(one)(a, b)) * 0 + salt
    return run


for c in ("all", "row_d0", "row_i", "col_i", "ratio"):
    timeit(f"int8 consume={c:7s}", make(c), ai, bi)
timeit("bf16 consume=all    ", make("all"), abf, bbf)


# pure matmul floor: same K=128 shape, chained consumption
@jax.jit
def mm_floor(a, b, salt):
    def one(x, y):
        ab = jax.lax.dot_general(
            x, y, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32,
            precision=jax.lax.Precision.DEFAULT)
        return jnp.sum(ab, dtype=jnp.int32)
    return jnp.sum(jax.vmap(one)(ai, bi)).astype(jnp.float32) * 0 + salt


timeit("XLA int8 matmul+sum ", mm_floor, ai, bi)
