"""Why is the (M,128)x(128,N) descriptor matmul at 8% MFU?

Probes: K scaling (128 vs 256 vs 512), pure-XLA dot rate for the same
shape, int8 vs bf16, and a pallas K-blocked variant.
"""

import functools
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

M = N = 6144
STEPS = 16


def timeit(name, fn, flops):
    out = fn()
    float(jnp.sum(out[0] if isinstance(out, (tuple, list)) else out))
    t0 = time.perf_counter()
    outs = [fn() for _ in range(STEPS)]
    for o in outs:
        float(jnp.sum(o[0] if isinstance(o, (tuple, list)) else o))
    dt = (time.perf_counter() - t0) / STEPS
    print(f"{name}: {dt*1000:.2f} ms  {flops/dt/1e12:.1f} TFLOP/s")


rng = np.random.default_rng(0)

# --- pallas matmul-only kernel, varying K ---
def mm_kernel(a_ref, b_ref, o_ref, *, ta, tb):
    dn = (((1,), (1,)), ((), ()))
    ab = jax.lax.dot_general(a_ref[:], b_ref[:], dn,
                             preferred_element_type=jnp.float32,
                             precision=jax.lax.Precision.DEFAULT)
    o_ref[:] = jnp.sum(ab, axis=1, keepdims=True)


def make_pallas(K, ta, tb, dtype):
    a = jnp.asarray(rng.normal(0, 1, (M, K)), dtype)
    b = jnp.asarray(rng.normal(0, 1, (N, K)), dtype)
    kern = functools.partial(mm_kernel, ta=ta, tb=tb)

    @jax.jit
    def run(a, b):
        return pl.pallas_call(
            kern,
            grid=(M // ta, N // tb),
            in_specs=[pl.BlockSpec((ta, K), lambda i, j: (i, 0)),
                      pl.BlockSpec((tb, K), lambda i, j: (j, 0))],
            out_specs=pl.BlockSpec((ta, 1), lambda i, j: (i, 0)),
            out_shape=jax.ShapeDtypeStruct((M, 1), jnp.float32),
        )(a, b)
    return lambda: run(a, b)


for K in (128, 256, 512):
    timeit(f"pallas bf16 K={K} ta=128 tb={N}", make_pallas(K, 128, N, jnp.bfloat16),
           2 * M * N * K)

for ta, tb in ((256, 2048), (512, 1024), (512, 512)):
    try:
        timeit(f"pallas bf16 K=128 ta={ta} tb={tb}",
               make_pallas(128, ta, tb, jnp.bfloat16), 2 * M * N * 128)
    except Exception as e:
        print(f"ta={ta} tb={tb}: FAILED {str(e)[:100]}")

# --- plain XLA dot, same shape (writes the 151 MB product to HBM) ---
for dt_name, dt in (("bf16", jnp.bfloat16), ("int8", jnp.int8)):
    if dt == jnp.int8:
        a = jnp.asarray(rng.integers(-127, 127, (M, 128)), jnp.int8)
        b = jnp.asarray(rng.integers(-127, 127, (128, N)), jnp.int8)
        f = jax.jit(lambda a, b: jax.lax.dot_general(
            a, b, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32,
            precision=jax.lax.Precision.DEFAULT))
    else:
        a = jnp.asarray(rng.normal(0, 1, (M, 128)), dt)
        b = jnp.asarray(rng.normal(0, 1, (128, N)), dt)
        f = jax.jit(lambda a, b: jax.lax.dot_general(
            a, b, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT))
    g = jax.jit(lambda a, b: jnp.sum(f(a, b), axis=1))
    timeit(f"XLA dot {dt_name} (6144,128)@(128,6144)+rowsum",
           lambda a=a, b=b, g=g: g(a, b), 2 * M * N * 128)

# --- big-K control: descriptor-shaped work rearranged as K=1024 ---
a = jnp.asarray(rng.normal(0, 1, (M, 1024)), jnp.bfloat16)
b = jnp.asarray(rng.normal(0, 1, (1024, N)), jnp.bfloat16)
f2 = jax.jit(lambda a, b: jnp.sum(jnp.dot(a, b,
                                          preferred_element_type=jnp.float32,
                                          precision=jax.lax.Precision.DEFAULT),
                                  axis=1))
timeit("XLA dot bf16 (6144,1024)@(1024,6144)+rowsum",
       lambda: f2(a, b), 2 * M * N * 1024)
