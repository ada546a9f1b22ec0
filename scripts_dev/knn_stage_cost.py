"""Stage-cost decomposition of the packed 2-NN kernel: matmul-only vs
+row-top1 vs +row-top2 vs +col (full). Identifies the VPU bottleneck."""

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
STEPS = 32
TA, TB = 128, 6144

rng = np.random.default_rng(0)
a8 = rng.integers(0, 256, (BATCH, N_PAD, DIM)).astype(np.uint8)
b8 = rng.integers(0, 256, (BATCH, N_PAD, DIM)).astype(np.uint8)
ai = jnp.asarray((a8.astype(np.int16) - 128).astype(np.int8))
bi = jnp.asarray((b8.astype(np.int16) - 128).astype(np.int8))
na2 = jnp.sum(jnp.square(ai.astype(jnp.int32)), axis=-1, keepdims=True)
nb2 = jnp.sum(jnp.square(bi.astype(jnp.int32)), axis=-1, keepdims=True)

_IDX_MASK = (1 << 13) - 1
_KEY_MAX = 0x7FFFFFFF


def kernel(a_ref, b_ref, na2_ref, nb2_ref, row_ref, col_ref, r1_ref, r2_ref,
           *, stage):
    ia = pl.program_id(0)
    ib = pl.program_id(1)
    dn = (((1,), (1,)), ((), ()))
    ab = jax.lax.dot_general(a_ref[:], b_ref[:], dn,
                             preferred_element_type=jnp.int32,
                             precision=jax.lax.Precision.DEFAULT)
    if stage == 0:  # matmul + d2 only
        row_ref[:] = jnp.sum(ab, axis=1, keepdims=True) * jnp.ones((1, 2), jnp.int32)
        col_ref[:] = jnp.zeros_like(col_ref)
        return
    d2 = (na2_ref[:][:, 0][:, None] + nb2_ref[:][:, 0][None, :] - 2 * ab) \
        .astype(jnp.float32)
    bits = jax.lax.bitcast_convert_type(d2, jnp.int32) & jnp.int32(~_IDX_MASK)
    cols = jax.lax.broadcasted_iota(jnp.int32, (TA, TB), 1)
    rowkey = bits | cols
    m1 = jnp.min(rowkey, axis=1)
    if stage == 1:  # + row top-1
        row_ref[:] = m1[:, None] * jnp.ones((1, 2), jnp.int32)
        col_ref[:] = jnp.zeros_like(col_ref)
        return
    masked = jnp.where(rowkey == m1[:, None], jnp.int32(_KEY_MAX), rowkey)
    m2 = jnp.min(masked, axis=1)
    if stage == 2:  # + row top-2
        row_ref[:] = jnp.stack([m1, m2], axis=1)
        col_ref[:] = jnp.zeros_like(col_ref)
        return
    rows = jax.lax.broadcasted_iota(jnp.int32, (TA, TB), 0) + ia * TA
    colkey = jnp.min(bits | rows, axis=0)[None, :]
    row_ref[:] = jnp.stack([m1, m2], axis=1)

    @pl.when(ia == 0)
    def _():
        col_ref[:] = colkey

    @pl.when(ia > 0)
    def _():
        col_ref[:] = jnp.minimum(colkey, col_ref[:])


def make(stage):
    k = functools.partial(kernel, stage=stage)

    @jax.jit
    def run(a, b, n2a, n2b):
        def one(x, y, za, zb):
            row, col = pl.pallas_call(
                k,
                grid=(N_PAD // TA, N_PAD // TB),
                in_specs=[
                    pl.BlockSpec((TA, DIM), lambda ia, ib: (ia, 0)),
                    pl.BlockSpec((TB, DIM), lambda ia, ib: (ib, 0)),
                    pl.BlockSpec((TA, 1), lambda ia, ib: (ia, 0)),
                    pl.BlockSpec((TB, 1), lambda ia, ib: (ib, 0)),
                ],
                out_specs=[
                    pl.BlockSpec((TA, 2), lambda ia, ib: (ia, 0)),
                    pl.BlockSpec((1, N_PAD), lambda ia, ib: (0, 0)),
                ],
                out_shape=[
                    jax.ShapeDtypeStruct((N_PAD, 2), jnp.int32),
                    jax.ShapeDtypeStruct((1, N_PAD), jnp.int32),
                ],
                scratch_shapes=[pltpu.VMEM((TA, 1), jnp.int32),
                                pltpu.VMEM((TA, 1), jnp.int32)],
            )(x, y, za, zb)
            return jnp.sum(row) + jnp.sum(col)
        return jax.vmap(one)(a, b, n2a, n2b)
    return run


for stage, name in [(0, "matmul+rowsum"), (1, "+d2+pack+row-top1"),
                    (2, "+row-top2(mask+min)"), (3, "full(+col)")]:
    fn = make(stage)
    out = fn(ai, bi, na2, nb2)
    float(jnp.sum(out))
    t0 = time.perf_counter()
    outs = [fn(ai, bi, na2, nb2) for _ in range(STEPS)]
    for o in outs:
        float(jnp.sum(o))
    dt = time.perf_counter() - t0
    print(f"stage {stage} {name}: {dt/STEPS*1000:.1f} ms/batch "
          f"({BATCH*STEPS/dt:.0f} pairs/s)")
