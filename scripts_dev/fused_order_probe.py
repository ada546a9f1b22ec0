"""Order-controlled probe: knn_match_fused vs match_pair_dense (which
should route to the SAME fused path when _FUSED_EPILOGUE is on). Times
each twice, interleaved, to separate real cost from sequencing artifacts
on the tunneled worker."""
import sys, os, time
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
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    acc = fn(*args)
    for _ in range(STEPS - 1):
        acc = fn(*args) + acc * 0
    v = float(jnp.sum(acc))
    dt = time.perf_counter() - t0
    print(f"{name}: {dt/STEPS*1000:.2f} ms/batch ({B*STEPS/dt:.0f} pairs/s)  [{v:.0f}]",
          flush=True)


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
order = sys.argv[1] if len(sys.argv) > 1 else "cdcd"
for ch in order:
    if ch == "c":
        timeit("C knn_match_fused   ", comp_c, a8, b8, uvb)
    else:
        timeit("D match_pair_dense  ", comp_d, a8, b8, uvb)
