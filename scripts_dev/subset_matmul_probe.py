"""_score_subset scatter-min (2.1 ms/64-batch) vs a rank-equality one-hot
matmul: slot t's first valid entry has rank r_t = ceil(t*nv/m)+1 (nv>=m)
or t+1 (nv<m); exactly one valid position has each rank, so
sub = OH @ pos with OH[t,p] = valid[p] & (ranks[p] == r_t). Checks
bit-equality with the scatter form, then times norm+subset chains."""

import time
import sys

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from imageanalysis_tpu.ops import ransac

N_PAD = 6144
BATCH = 64
STEPS = 32
SP = 512

rng = np.random.default_rng(0)
uv_a = rng.uniform(0, 4000, (BATCH, N_PAD, 2)).astype(np.float32)
jua = jnp.asarray(uv_a)
ok0 = jnp.asarray(rng.random((BATCH, N_PAD)) < 0.2)


def subset_matmul(valid, ranks, m):
    n = valid.shape[0]
    n_valid = ranks[-1]
    t = jnp.arange(m, dtype=jnp.int32)
    r_t = jnp.where(n_valid >= m, (t * n_valid + m - 1) // m + 1, t + 1)
    oh = (valid[None, :] & (ranks[None, :] == r_t[:, None])).astype(jnp.float32)
    pos = jnp.arange(n, dtype=jnp.float32)
    hit = oh @ pos                      # (m,) exactly-one-hot rows
    got = oh @ jnp.ones((n,), jnp.float32)
    sub = jnp.where(got > 0, hit, float(n - 1)).astype(jnp.int32)
    sub_ok = t < n_valid
    return sub, sub_ok


# --- correctness: bit-equality across valid-count regimes ---
for nv_frac in (0.0, 0.01, 0.05, 0.2, 0.9, 1.0):
    v = jnp.asarray(rng.random((N_PAD,)) < nv_frac)
    r = ransac._valid_cumsum(v)
    s1, k1 = ransac._score_subset(v, r, SP)
    s2, k2 = subset_matmul(v, r, SP)
    same_sub = bool(jnp.all(s1 == s2))
    same_ok = bool(jnp.all(k1 == k2))
    print(f"nv_frac={nv_frac}: sub equal={same_sub} ok equal={same_ok} "
          f"nv={int(r[-1])}")
    if not (same_sub and same_ok):
        bad = np.nonzero(np.asarray(s1 != s2))[0][:10]
        print("  first diffs at", bad, np.asarray(s1)[bad], np.asarray(s2)[bad])


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
    print(f"{name}: {dt/STEPS*1000:.2f} ms/batch")


def make(form):
    @jax.jit
    def run(ua, v0, salt):
        def one(pa, valid):
            pa_n, Ta = ransac._normalize_2d(pa, valid)
            ranks = ransac._valid_cumsum(valid)
            if form == "scatter":
                sub, sub_ok = ransac._score_subset(valid, ranks, SP)
            else:
                sub, sub_ok = subset_matmul(valid, ranks, SP)
            return jnp.sum(sub).astype(jnp.float32) + jnp.sum(pa_n)
        out = jax.vmap(one)(ua, v0)
        return jnp.sum(out) * 0 + salt
    return run


timeit("norm+subset scatter", make("scatter"), jua, ok0)
timeit("norm+subset matmul ", make("matmul"), jua, ok0)
