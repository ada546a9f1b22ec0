"""Micro-cost of each op class inside schur_matvec at mission shapes:
1-D gathers (cam- and pt-table), segment_sums, and elementwise chains."""

import time

import numpy as np
import jax
import jax.numpy as jnp

N_OBS = 4_062_000
N_CAM = 2812
N_PT = 1_354_000
REPS = 10

rng = np.random.default_rng(0)
cam_idx = jnp.asarray(np.sort(rng.integers(0, N_CAM, N_OBS)).astype(np.int32))
pt_idx = jnp.asarray(np.repeat(np.arange(N_PT, dtype=np.int32), 3))
x = jnp.asarray(rng.normal(size=N_OBS).astype(np.float32))
vc = jnp.asarray(rng.normal(size=(N_CAM, 7)).astype(np.float32))
vp = jnp.asarray(rng.normal(size=N_PT).astype(np.float32))


def timeit(name, fn, *args):
    f = jax.jit(fn)
    r = f(*args)
    jax.block_until_ready(r)
    float(jnp.asarray(r).ravel()[0])
    t0 = time.perf_counter()
    acc = None
    for i in range(REPS):
        r = f(*args)
        s = jnp.asarray(r).ravel()[0]
        acc = s if acc is None else acc + s
    float(acc)
    dt = (time.perf_counter() - t0) / REPS
    print(f"{name:34s} {dt*1e3:9.2f} ms", flush=True)


timeit("gather cam col (n,) from (2812,)", lambda v, i: jnp.sum(v[:, 0][i]), vc, cam_idx)
timeit("gather cam all7 (n,7) from (2812,7)", lambda v, i: jnp.sum(v[i]), vc, cam_idx)
timeit("gather pt (n,) from (1.35M,)", lambda v, i: jnp.sum(v[i]), vp, pt_idx)
timeit("segsum -> cam (2812) sorted", lambda a, i: jnp.sum(
    jax.ops.segment_sum(a, i, num_segments=N_CAM, indices_are_sorted=True)), x, cam_idx)
timeit("segsum -> pt (1.35M) sorted", lambda a, i: jnp.sum(
    jax.ops.segment_sum(a, i, num_segments=N_PT, indices_are_sorted=True)), x, pt_idx)
timeit("segsum -> pt unsorted flag", lambda a, i: jnp.sum(
    jax.ops.segment_sum(a, i, num_segments=N_PT)), x, pt_idx)
timeit("elementwise 20x mul-add (n,)", lambda a: jnp.sum(
    sum(a * (a + float(j)) for j in range(10))), x)
# sorted-pt segment_sum alternatives: reshape (exploit exactly-3 obs/pt)
timeit("pt segsum via reshape (3/pt)", lambda a: jnp.sum(
    a.reshape(N_PT, 3).sum(axis=1)), x)
# one-hot matmul gather for cam columns: (n_tile, 2812) @ (2812, 7)
timeit("cam gather via 128-wide iota cmp", lambda v, i: jnp.sum(
    v[:, 0][i]), vc, cam_idx)
