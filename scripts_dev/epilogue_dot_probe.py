"""Micro-probe: does a Pallas DEFAULT-precision one-hot dot preserve
bf16-exact value rows? Gathers known values through the same (tile, n)
one-hot MXU dot the match epilogue uses and prints per-row errors."""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

N, T = 6144, 128
rng = np.random.default_rng(1)
j = rng.integers(0, N, (T,)).astype(np.int32)
u = rng.uniform(0, 4100, (N,)).astype(np.float32)

uvt = jnp.asarray(u)[None, :]
hi = uvt.astype(jnp.bfloat16).astype(jnp.float32)
mid = (uvt - hi).astype(jnp.bfloat16).astype(jnp.float32)
lo = uvt - hi - mid
vals6 = jnp.concatenate([hi, mid, lo], axis=0)  # (3, N)
print("split recombines exactly on host:",
      float(jnp.max(jnp.abs((hi + mid) + lo - uvt))))


def kern(j_ref, vals_ref, out_ref):
    jj = j_ref[:][:, 0]
    iota = jax.lax.broadcasted_iota(jnp.int32, (T, N), 1)
    oneh = (jj[:, None] == iota).astype(jnp.float32)
    picked = jax.lax.dot_general(oneh, vals_ref[:], (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32,
                                 precision=jax.lax.Precision.DEFAULT)
    out_ref[:] = picked


out = pl.pallas_call(
    kern,
    in_specs=[pl.BlockSpec((T, 1), lambda: (0, 0)),
              pl.BlockSpec((3, N), lambda: (0, 0))],
    out_specs=pl.BlockSpec((T, 3), lambda: (0, 0)),
    out_shape=jax.ShapeDtypeStruct((T, 3), jnp.float32),
    interpret=jax.default_backend() != "tpu",
)(jnp.asarray(j)[:, None], vals6)
out = np.asarray(out)
tgt = np.stack([np.asarray(hi)[0, j], np.asarray(mid)[0, j],
                np.asarray(lo)[0, j]], axis=1)
for k, name in enumerate(["hi", "mid", "lo"]):
    err = np.abs(out[:, k] - tgt[:, k])
    print(f"{name}: maxerr {err.max():.6g}  sample out {out[:3, k]} "
          f"tgt {tgt[:3, k]}")
rec = (out[:, 0] + out[:, 1]) + out[:, 2]
print("recombined maxerr:", np.abs(rec - u[j]).max())
