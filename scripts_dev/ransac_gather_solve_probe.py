"""Attack the two big RANSAC slices from ransac_chain_bisect:
gather (+3.2 ms) and solve (+3.3 ms) per 64-pair batch.

Variants:
  A. current: sub[pick] then flat gathers from the (N,2) arrays
  B. small-table: gather pa_n[sub] once (already needed for scoring),
     then index minimal sets into the (m,2) subset table
  C. one-hot matmul: minimal-set coords via (H*4, m) one-hot @ (m, 2)
     on the MXU
Each variant runs sample+gather+solve+score (the chain downstream of
subset), so numbers are comparable deltas over the shared prefix.
Chained-sum sync protocol.
"""

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
NH = 512
SP = 512

rng = np.random.default_rng(0)
uv_a = rng.uniform(0, 4000, (BATCH, N_PAD, 2)).astype(np.float32)
uv_b = (uv_a * np.array([1.02, 0.98]) + np.array([25.0, -40.0])
        + rng.normal(0, 0.5, uv_a.shape)).astype(np.float32)
jua, jub = jnp.asarray(uv_a), jnp.asarray(uv_b)
keys = jax.random.split(jax.random.PRNGKey(0), BATCH)
ok0 = jnp.asarray(rng.random((BATCH, N_PAD)) < 0.2)


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


def make(variant):
    @jax.jit
    def run(ua, ub, ks, v0, salt):
        def one(pa, pb, k, valid):
            pa_n, Ta = ransac._normalize_2d(pa, valid)
            pb_n, Tb = ransac._normalize_2d(pb, valid)
            ranks = ransac._valid_cumsum(valid)
            sub, sub_ok = ransac._score_subset(valid, ranks, SP)
            hi = jnp.maximum(jnp.minimum(ranks[-1], SP), 1)
            pick = jax.random.randint(k, (NH, 4), 0, hi)

            if variant == "A":
                idxf = sub[pick].reshape(-1)
                gx, gy = pa_n[idxf, 0], pa_n[idxf, 1]
                hx, hy = pb_n[idxf, 0], pb_n[idxf, 1]
                pa_s, pb_s = pa_n[sub], pb_n[sub]
            elif variant == "B":
                pa_s, pb_s = pa_n[sub], pb_n[sub]
                pf = pick.reshape(-1)
                gx, gy = pa_s[pf, 0], pa_s[pf, 1]
                hx, hy = pb_s[pf, 0], pb_s[pf, 1]
            else:  # C
                pa_s, pb_s = pa_n[sub], pb_n[sub]
                pf = pick.reshape(-1)
                oh = (pf[:, None] == jnp.arange(SP)[None, :]).astype(jnp.bfloat16)
                ga = (oh @ pa_s.astype(jnp.bfloat16)).astype(pa_n.dtype)
                gb = (oh @ pb_s.astype(jnp.bfloat16)).astype(pa_n.dtype)
                gx, gy = ga[:, 0], ga[:, 1]
                hx, hy = gb[:, 0], gb[:, 1]

            Hs = ransac._homography_4pt_scalar(
                [gx[i::4] for i in range(4)], [gy[i::4] for i in range(4)],
                [hx[i::4] for i in range(4)], [hy[i::4] for i in range(4)])
            errs = jax.vmap(
                lambda H: ransac._homography_error(H, pa_s, pb_s))(Hs)
            t_norm = 7.9 * Tb[0, 0]
            scores = jnp.sum((errs < t_norm) & sub_ok[None, :], axis=1)
            return jnp.sum(Hs[jnp.argmax(scores)])

        out = jax.vmap(one)(ua, ub, ks, v0)
        return jnp.sum(out) * 0 + salt
    return run


for v in ("A", "B", "C"):
    timeit(f"variant {v}", make(v), jua, jub, keys, ok0)

# solve-only comparison: reshaped-lane strides vs direct (H,4) gathers
def make_solve(form):
    @jax.jit
    def run(ua, ub, ks, v0, salt):
        def one(pa, pb, k, valid):
            pa_n, _ = ransac._normalize_2d(pa, valid)
            pb_n, _ = ransac._normalize_2d(pb, valid)
            ranks = ransac._valid_cumsum(valid)
            sub, _ = ransac._score_subset(valid, ranks, SP)
            hi = jnp.maximum(jnp.minimum(ranks[-1], SP), 1)
            pick = jax.random.randint(k, (NH, 4), 0, hi)
            pa_s, pb_s = pa_n[sub], pb_n[sub]
            if form == "strided":
                pf = pick.reshape(-1)
                gx, gy = pa_s[pf, 0], pa_s[pf, 1]
                hx, hy = pb_s[pf, 0], pb_s[pf, 1]
                Hs = ransac._homography_4pt_scalar(
                    [gx[i::4] for i in range(4)],
                    [gy[i::4] for i in range(4)],
                    [hx[i::4] for i in range(4)],
                    [hy[i::4] for i in range(4)])
            else:  # columns: one gather per point-slot, no strided slices
                Hs = ransac._homography_4pt_scalar(
                    [pa_s[pick[:, i], 0] for i in range(4)],
                    [pa_s[pick[:, i], 1] for i in range(4)],
                    [pb_s[pick[:, i], 0] for i in range(4)],
                    [pb_s[pick[:, i], 1] for i in range(4)])
            return jnp.sum(jnp.where(jnp.isfinite(Hs), Hs, 0.0))

        out = jax.vmap(one)(ua, ub, ks, v0)
        return jnp.sum(out) * 0 + salt
    return run


for f in ("strided", "columns"):
    timeit(f"solve {f}", make_solve(f), jua, jub, keys, ok0)
