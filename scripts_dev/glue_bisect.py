"""Bisect the ~5 ms between knn_top2-alone (12.3 ms, tile sweep) and the
full dense epilogue (16.4-17.6 ms): which consumer costs what?
Stages: kernel-sums -> +ratio -> +mutual(onehot) -> +bounds -> full."""

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


def make(stage):
    @jax.jit
    def run(a, b, salt):
        def one(x, y):
            rd, ri, cd, ci = knn.knn_top2(x, y)
            if stage == "kernel":
                return jnp.sum(ri) + jnp.sum(ci)
            arange_a = jnp.arange(N_PAD, dtype=jnp.int32)
            best_j = ri[:, 0]
            d1 = jnp.maximum(rd[:, 0], 0.0)
            d2 = jnp.maximum(rd[:, 1], 0.0)
            ok = d1 < RATIO2 * d2
            if stage == "ratio":
                return jnp.sum(ok) + jnp.sum(best_j)
            if stage == "mutual-gather":
                ok &= ci[best_j] == arange_a
                return jnp.sum(ok) + jnp.sum(best_j)
            oh = (best_j[:, None]
                  == jnp.arange(N_PAD, dtype=jnp.int32)[None, :]
                  ).astype(jnp.float32)
            back = (oh @ ci.astype(jnp.float32)).astype(jnp.int32)
            ok &= back == arange_a
            if stage == "mutual-onehot":
                return jnp.sum(ok) + jnp.sum(best_j)
            ok &= arange_a < N_FEAT
            ok &= best_j < N_FEAT
            return jnp.sum(ok) + jnp.sum(best_j)
        out = jax.vmap(one)(a, b)
        return jnp.sum(out).astype(jnp.float32) * 0 + salt
    return run


for st in ("kernel", "ratio", "mutual-gather", "mutual-onehot", "full"):
    timeit(f"{st:14s}", make(st), ai, bi)
