"""Standalone cumulative bisect of ransac_homography's stages at bench
shapes (64 pairs x 6144 pts, 2000 valid, n_hyp=512, score_points=512)."""
import functools
import time

import numpy as np
import jax
import jax.numpy as jnp

from imageanalysis_tpu.ops import ransac

N_PAD, BATCH, STEPS, NH, SP = 6144, 64, 32, 512, 512
THRESH = 7.9

rng = np.random.default_rng(0)
ua = rng.uniform(0, 4000, (BATCH, N_PAD, 2)).astype(np.float32)
ub = (ua * np.array([1.02, 0.98]) + np.array([25.0, -40.0])
      + rng.normal(0, 0.5, ua.shape)).astype(np.float32)
valid = np.zeros((BATCH, N_PAD), bool)
valid[:, :2000] = True
ua, ub, valid = jnp.asarray(ua), jnp.asarray(ub), jnp.asarray(valid)
keys = jax.random.split(jax.random.PRNGKey(0), BATCH)


def stage_fn(stage):
    @jax.jit
    def fn(pa, pb, v, ks):
        def one(xa, xb, vv, k):
            pa_n, Ta = ransac._normalize_2d(xa, vv)
            pb_n, Tb = ransac._normalize_2d(xb, vv)
            if stage == "norm":
                return jnp.sum(pa_n) + jnp.sum(pb_n)
            ranks = ransac._valid_cumsum(vv)
            sub, sub_ok = ransac._score_subset(vv, ranks, SP)
            if stage == "subset":
                return jnp.sum(sub) + jnp.sum(sub_ok)
            idx = ransac._sample_from_subset(k, sub, ranks[-1], NH, 4)
            if stage == "sample":
                return jnp.sum(idx)
            idxf = idx.reshape(-1)
            gx, gy = pa_n[idxf, 0], pa_n[idxf, 1]
            hx, hy = pb_n[idxf, 0], pb_n[idxf, 1]
            Hs = ransac._homography_4pt_scalar(
                [gx[i::4] for i in range(4)], [gy[i::4] for i in range(4)],
                [hx[i::4] for i in range(4)], [hy[i::4] for i in range(4)])
            if stage == "solve":
                return jnp.sum(jnp.abs(Hs))
            errs = jax.vmap(
                lambda H: ransac._homography_error(H, pa_n[sub], pb_n[sub]))(Hs)
            t_norm = THRESH * Tb[0, 0]
            scores = jnp.sum((errs < t_norm) & sub_ok[None, :], axis=1)
            best = jnp.argmax(scores)
            H_best = Hs[best]
            if stage == "score":
                return jnp.sum(H_best)

            def refine(H, _):
                e = ransac._homography_error(H, pa_n, pb_n)
                w = ((e < t_norm) & vv).astype(xa.dtype)
                return ransac._homography_dlt(pa_n, pb_n, w), None

            H_ref, _ = jax.lax.scan(refine, H_best, None, length=2)
            if stage == "refine":
                return jnp.sum(H_ref)
            err = ransac._homography_error(H_ref, pa_n, pb_n)
            inl = (err < t_norm) & vv
            return jnp.sum(inl) + jnp.sum(H_ref)

        return jax.vmap(one)(pa, pb, v, ks)

    return fn


prev = 0.0
for stage in ("norm", "subset", "sample", "solve", "score", "refine", "full"):
    fn = stage_fn(stage)
    float(jnp.sum(fn(ua, ub, valid, keys)))
    t0 = time.perf_counter()
    outs = [fn(ua, ub, valid, keys) for _ in range(STEPS)]
    float(jnp.sum(outs[-1]))
    dt = (time.perf_counter() - t0) / STEPS * 1000
    print(f"{stage:8s} {dt:8.2f} ms/batch  (+{dt-prev:7.2f})")
    prev = dt
