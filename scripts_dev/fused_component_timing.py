"""Time the pieces of the two-launch fused match path vs the unfused path.

Components (all vmapped B=64, n=6144, d=128 int8, bench shapes):
  A. knn_top2 packed path (old tiling, tile_b from its own heuristic)
  B. _knn_packed_raw with the full-B tile (what knn_match_fused launches)
  C. knn_match_fused total (raw full-B + epilogue kernel)
  D. match_pair_dense unfused total (knn_top2 + XLA one-hot glue)

Chained-scalar protocol: enqueue STEPS dependent steps, download once.
"""
import sys, os, time, functools
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp

from imageanalysis_tpu.ops import knn

N, D, B, STEPS = 6144, 128, 64, 32
rng = np.random.default_rng(0)
da = rng.integers(0, 100, (B, N, D)).astype(np.float32)
db = rng.integers(0, 100, (B, N, D)).astype(np.float32)
db[:, :1500] = np.clip(np.round(da[:, :1500] + rng.normal(0, 4, (B, 1500, D))), 0, 255)
da[:, 6000:] = 255.0
db[:, 6000:] = 255.0
uvb = jnp.asarray(rng.uniform(0, 4000, (B, N, 2)).astype(np.float32))
a8 = jnp.asarray((da - 128).astype(np.int8))
b8 = jnp.asarray((db - 128).astype(np.int8))


def timeit(name, fn, *args):
    out = fn(*args)                      # compile + warm
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    acc = fn(*args)
    for _ in range(STEPS - 1):
        acc = fn(*args) + acc * 0        # chain a data dependency
    v = float(jnp.sum(acc))
    dt = time.perf_counter() - t0
    print(f"{name}: {dt/STEPS*1000:.2f} ms/batch ({B*STEPS/dt:.0f} pairs/s)  [{v:.0f}]")


@jax.jit
def comp_a(a, b):
    def one(x, y):
        rd, ri, cd, ci = knn.knn_top2(x, y)
        return jnp.sum(ri) + jnp.sum(ci)
    return jax.vmap(one)(a, b)


@jax.jit
def comp_b(a, b):
    def one(x, y):
        na2 = jnp.sum(jnp.square(x.astype(jnp.int32)), axis=-1, keepdims=True)
        nb2 = jnp.sum(jnp.square(y.astype(jnp.int32)), axis=-1, keepdims=True)
        rp, cp = knn._knn_packed_raw(x, y, na2, nb2, 128, N)
        return jnp.sum(rp) + jnp.sum(cp)
    return jax.vmap(one)(a, b)


@jax.jit
def comp_b512(a, b):
    def one(x, y):
        na2 = jnp.sum(jnp.square(x.astype(jnp.int32)), axis=-1, keepdims=True)
        nb2 = jnp.sum(jnp.square(y.astype(jnp.int32)), axis=-1, keepdims=True)
        rp, cp = knn._knn_packed_raw(x, y, na2, nb2, 128, 512)
        return jnp.sum(rp) + jnp.sum(cp)
    return jax.vmap(one)(a, b)


@jax.jit
def comp_c(a, b, uv):
    def one(x, y, u):
        bj, ok, pb = knn.knn_match_fused(x, y, u, ratio=0.75)
        return jnp.sum(bj) + jnp.sum(ok) + jnp.sum(pb)
    return jax.vmap(one)(a, b, uv)


@jax.jit
def comp_d(a, b, uv):
    def one(x, y, u):
        bj, ok, pb = knn.match_pair_dense(
            x, y, 6000, 6000, ratio=0.75, use_pallas=True, uv_b=u)
        return jnp.sum(bj) + jnp.sum(ok) + jnp.sum(pb)
    return jax.vmap(one)(a, b, uv)


print("backend:", jax.default_backend(), " fused flag:", knn._FUSED_EPILOGUE)
timeit("A knn_top2 packed (own tiling)", comp_a, a8, b8)
timeit("B raw packed full-B tile     ", comp_b, a8, b8)
timeit("B512 raw packed tile_b=512   ", comp_b512, a8, b8)
timeit("C fused total (raw+epilogue) ", comp_c, a8, b8, uvb)
timeit("D unfused total (top2+XLA)   ", comp_d, a8, b8, uvb)
