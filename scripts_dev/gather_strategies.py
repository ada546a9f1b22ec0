"""TPU gather strategy shootout at the matcher's shapes.

The match pipeline's non-matmul time is dominated by gathers:
  glue:   pb = take_along_axis(ub (6144,2), best_j (6144,))   x64 pairs
  solve:  pa_n[idx (2048,), 0/1] minimal-set coordinate pulls x64 pairs
  subset: pa_n[sub (512,)] scoring pulls                      x64 pairs

Candidates per gather: (a) row take_along_axis / fancy index, (b) two 1-D
per-coordinate gathers, (c) one-hot f32 matmul (exact: single 1.0/row).
"""
import time

import numpy as np
import jax
import jax.numpy as jnp

B, N, M = 64, 6144, 2048

rng = np.random.default_rng(0)
uv = jnp.asarray(rng.uniform(0, 4000, (B, N, 2)).astype(np.float32))
u1 = jnp.asarray(np.ascontiguousarray(np.asarray(uv)[..., 0]))
v1 = jnp.asarray(np.ascontiguousarray(np.asarray(uv)[..., 1]))
idxN = jnp.asarray(rng.integers(0, N, (B, N)).astype(np.int32))
idxM = jnp.asarray(rng.integers(0, N, (B, M)).astype(np.int32))


def bench(name, fn, *args, steps=48):
    out = fn(*args)
    float(jnp.sum(out[0] if isinstance(out, tuple) else out))
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(steps)]
    o = outs[-1]
    float(jnp.sum(o[0] if isinstance(o, tuple) else o))
    dt = (time.perf_counter() - t0) / steps * 1000
    print(f"{name:44s} {dt:8.2f} ms/batch")


@jax.jit
def g_rows_N(uv_, idx_):
    def one(t, i):
        return jnp.take_along_axis(t, i[:, None], axis=0)
    return jax.vmap(one)(uv_, idx_)


@jax.jit
def g_1d_N(u_, v_, idx_):
    def one(x, y, i):
        return x[i], y[i]
    return jax.vmap(one)(u_, v_, idx_)


@jax.jit
def g_onehot_N(uv_, idx_):
    def one(t, i):
        oh = (i[:, None] == jnp.arange(N, dtype=jnp.int32)[None, :])
        return oh.astype(jnp.float32) @ t
    return jax.vmap(one)(uv_, idx_)


@jax.jit
def g_rows_M(uv_, idx_):
    def one(t, i):
        return jnp.take_along_axis(t, i[:, None], axis=0)
    return jax.vmap(one)(uv_, idx_)


@jax.jit
def g_1d_M(u_, v_, idx_):
    def one(x, y, i):
        return x[i], y[i]
    return jax.vmap(one)(u_, v_, idx_)


@jax.jit
def g_onehot_M(uv_, idx_):
    def one(t, i):
        oh = (i[:, None] == jnp.arange(N, dtype=jnp.int32)[None, :])
        return oh.astype(jnp.float32) @ t
    return jax.vmap(one)(uv_, idx_)


print("gather N->N (glue pb):")
bench("  rows take_along_axis", g_rows_N, uv, idxN)
bench("  two 1-D gathers", g_1d_N, u1, v1, idxN)
bench("  one-hot matmul", g_onehot_N, uv, idxN)
print("gather M=2048 (solve minimal sets):")
bench("  rows take_along_axis", g_rows_M, uv, idxM)
bench("  two 1-D gathers", g_1d_M, u1, v1, idxM)
bench("  one-hot matmul", g_onehot_M, uv, idxM)

# cumsum + searchsorted vs scatter-compaction for the score subset
valid = np.zeros((B, N), bool)
valid[:, :2000] = True
validj = jnp.asarray(valid)
SP = 512


@jax.jit
def subset_searchsorted(v):
    def one(vv):
        ranks = jnp.cumsum(vv.astype(jnp.int32))
        n_valid = ranks[-1]
        tgt = jnp.minimum((jnp.arange(SP, dtype=jnp.int32)
                           * jnp.maximum(n_valid, 1)) // SP + 1,
                          jnp.maximum(n_valid, 1))
        sub = jnp.searchsorted(ranks, tgt).astype(jnp.int32)
        return jnp.minimum(sub, N - 1)
    return jax.vmap(one)(v)


@jax.jit
def subset_scatter(v):
    def one(vv):
        ranks = jnp.cumsum(vv.astype(jnp.int32))
        n_valid = jnp.maximum(ranks[-1], 1)
        # slot for the r-th valid element (r = rank-1): floor(r*SP/n_valid)
        # first position landing in each slot wins (mode=min)
        slot = jnp.where(vv, (ranks - 1) * SP // n_valid, SP)
        out = jnp.full((SP,), N - 1, jnp.int32)
        pos = jnp.arange(N, dtype=jnp.int32)
        return out.at[slot].min(pos, mode="drop")
    return jax.vmap(one)(v)


print("score-subset selection:")
bench("  cumsum+searchsorted", subset_searchsorted, validj)
bench("  cumsum+scatter-min", subset_scatter, validj)
s1 = np.asarray(subset_searchsorted(validj))
s2 = np.asarray(subset_scatter(validj))
print("  first-row agreement:", np.mean(s1 == s2))
