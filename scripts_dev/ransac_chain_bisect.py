"""RANSAC-internal cost bisect with the chained-sum protocol and a
data-dependent valid mask (the old ransac_bisect used per-output syncs and
a constant mask — both wrong on this runtime).

Stages build up ransac_homography: norm -> subset -> sample -> gather ->
solve -> score -> refine1/2 -> final.
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


def make(stage):
    @jax.jit
    def run(ua, ub, ks, v0, salt):
        def one(pa, pb, k, valid):
            pa_n, Ta = ransac._normalize_2d(pa, valid)
            pb_n, Tb = ransac._normalize_2d(pb, valid)
            if stage == "norm":
                return jnp.sum(pa_n) + jnp.sum(pb_n)
            ranks = ransac._valid_cumsum(valid)
            sub, sub_ok = ransac._score_subset(valid, ranks, SP)
            if stage == "subset":
                return jnp.sum(sub).astype(jnp.float32)
            idx = ransac._sample_from_subset(k, sub, ranks[-1], NH, 4)
            if stage == "sample":
                return jnp.sum(idx).astype(jnp.float32)
            idxf = idx.reshape(-1)
            gx, gy = pa_n[idxf, 0], pa_n[idxf, 1]
            hx, hy = pb_n[idxf, 0], pb_n[idxf, 1]
            if stage == "gather":
                return jnp.sum(gx) + jnp.sum(hy)
            Hs = ransac._homography_4pt_scalar(
                [gx[i::4] for i in range(4)], [gy[i::4] for i in range(4)],
                [hx[i::4] for i in range(4)], [hy[i::4] for i in range(4)])
            if stage == "solve":
                return jnp.sum(jnp.where(jnp.isfinite(Hs), Hs, 0.0))
            errs = jax.vmap(
                lambda H: ransac._homography_error(H, pa_n[sub], pb_n[sub]))(Hs)
            t_norm = 7.9 * Tb[0, 0]
            scores = jnp.sum((errs < t_norm) & sub_ok[None, :], axis=1)
            best = jnp.argmax(scores)
            H_best = Hs[best]
            if stage == "score":
                return jnp.sum(H_best)

            def refine(H, _):
                e = ransac._homography_error(H, pa_n, pb_n)
                w = ((e < t_norm) & valid).astype(pa.dtype)
                return ransac._homography_dlt(pa_n, pb_n, w), None

            n_ref = {"refine1": 1, "refine2": 2}.get(stage, 2)
            H_ref, _ = jax.lax.scan(refine, H_best, None, length=n_ref)
            if stage in ("refine1", "refine2"):
                return jnp.sum(H_ref)
            err = ransac._homography_error(H_ref, pa_n, pb_n)
            inl = (err < t_norm) & valid
            return jnp.sum(inl).astype(jnp.float32)

        out = jax.vmap(one)(ua, ub, ks, v0)
        return jnp.sum(out) * 0 + salt
    return run


for st in ("norm", "subset", "sample", "gather", "solve", "score",
           "refine1", "refine2", "final"):
    timeit(f"{st:8s}", make(st), jua, jub, keys, ok0)
