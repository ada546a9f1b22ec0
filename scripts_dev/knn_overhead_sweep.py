"""Is the packed 2-NN kernel bound by per-grid-step overhead?

knn_stage_cost measured matmul-only at 34.6 ms/64-pair batch (TA=128 →
3072 grid steps ≈ 11 us/step) while the MXU roofline for the same matmuls
is ~2 ms. If time scales with step COUNT rather than FLOPs, the fix is
fewer, fatter steps (inner fori_loop over column chunks so VMEM stays
bounded while TA grows).

Sweeps (matmul + row-min only, int8 and bf16):
  TA x TB grid tiles, plus an inner-chunked variant.
"""
import functools
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N_PAD = 6144
DIM = 128
BATCH = 64
STEPS = 16

rng = np.random.default_rng(0)
a8 = rng.integers(0, 256, (BATCH, N_PAD, DIM)).astype(np.uint8)
b8 = rng.integers(0, 256, (BATCH, N_PAD, DIM)).astype(np.uint8)
ai = jnp.asarray((a8.astype(np.int16) - 128).astype(np.int8))
bi = jnp.asarray((b8.astype(np.int16) - 128).astype(np.int8))
abf = jnp.asarray(a8.astype(np.float32)).astype(jnp.bfloat16)
bbf = jnp.asarray(b8.astype(np.float32)).astype(jnp.bfloat16)


def make_fn(ta, tb, dtype, inner_chunk=0):
    def kernel(a_ref, b_ref, out_ref):
        dn = (((1,), (1,)), ((), ()))
        pet = jnp.int32 if dtype == jnp.int8 else jnp.float32
        if inner_chunk:
            acc = jnp.full((ta,), 2**30, pet)
            nch = tb // inner_chunk
            for c in range(nch):
                bc = b_ref[pl.ds(c * inner_chunk, inner_chunk), :]
                ab = jax.lax.dot_general(
                    a_ref[:], bc, dn, preferred_element_type=pet,
                    precision=jax.lax.Precision.DEFAULT)
                acc = jnp.minimum(acc, jnp.min(ab, axis=1))
            out_ref[:] = acc[:, None].astype(jnp.float32)
        else:
            ab = jax.lax.dot_general(
                a_ref[:], b_ref[:], dn, preferred_element_type=pet,
                precision=jax.lax.Precision.DEFAULT)
            out_ref[:] = jnp.min(ab, axis=1)[:, None].astype(jnp.float32)

    grid = (N_PAD // ta, N_PAD // tb)

    @jax.jit
    def fn(a, b):
        def one(aa, bb):
            return pl.pallas_call(
                kernel,
                grid=grid,
                in_specs=[
                    pl.BlockSpec((ta, DIM), lambda i, j: (i, 0)),
                    pl.BlockSpec((tb, DIM), lambda i, j: (j, 0)),
                ],
                out_specs=pl.BlockSpec((ta, 1), lambda i, j: (i, 0)),
                out_shape=jax.ShapeDtypeStruct((N_PAD, 1), jnp.float32),
            )(aa, bb)
        r = jax.vmap(one)(a, b)
        return jnp.sum(r)

    return fn, grid


def bench(name, fn):
    try:
        s = fn(ai if "int8" in name else abf, bi if "int8" in name else bbf)
        float(s)  # compile+sync
        t0 = time.perf_counter()
        acc = None
        for _ in range(STEPS):
            acc = fn(ai if "int8" in name else abf,
                     bi if "int8" in name else bbf)
        float(acc)
        dt = (time.perf_counter() - t0) / STEPS
        print(f"{name:38s} {dt*1000:8.2f} ms/batch  "
              f"{BATCH/dt:8.0f} pairs/s")
    except Exception as e:
        print(f"{name:38s} FAIL {str(e)[:90]}")


for dt_name, dtype in (("int8", jnp.int8), ("bf16", jnp.bfloat16)):
    for ta, tb, ic in ((128, 6144, 0), (256, 6144, 0), (512, 2048, 0),
                       (512, 6144, 1024), (1024, 6144, 1024),
                       (2048, 6144, 2048), (6144, 6144, 2048)):
        fn, grid = make_fn(ta, tb, dtype, ic)
        steps = grid[0] * grid[1] * BATCH
        bench(f"{dt_name} ta={ta} tb={tb} ic={ic} steps={steps}", fn)
