"""Sub-stage decomposition of the full match pipeline with CHAINED-SYNC
timing (enqueue all steps, accumulate one dependent scalar on device,
download once — per-step downloads cost a serialized ~34 ms RTT each and
invalidate naive stage profiles on this runtime).

Variants, cumulative:
  knn        — packed 2-NN kernel only
  glue       — + ratio test + mutual cross-check
  sample     — + RANSAC hypothesis sampling (cumsum/searchsorted/gather)
  solve      — + 4-point homography solves (vmapped 8×8 gauss)
  score      — + subset scoring + argmax
  refine     — + 2 weighted-DLT refine iters + final inliers (== full)
"""
import functools
import time

import numpy as np
import jax
import jax.numpy as jnp

from imageanalysis_tpu.ops import knn, ransac

N_FEAT, N_PAD, DIM, BATCH = 6000, 6144, 128, 64
STEPS = 24
THRESH = 7.9


def make_batch(rng):
    da = rng.uniform(0, 360, (BATCH, N_PAD, DIM)).astype(np.float32)
    db = rng.uniform(0, 360, (BATCH, N_PAD, DIM)).astype(np.float32)
    da[:, N_FEAT:] = knn.PAD_VALUE
    db[:, N_FEAT:] = knn.PAD_VALUE
    db[:, :1500] = da[:, :1500] + rng.normal(0, 4, (BATCH, 1500, DIM))
    ua = rng.uniform(0, 4000, (BATCH, N_PAD, 2)).astype(np.float32)
    ub = (ua * np.array([1.02, 0.98]) + np.array([25.0, -40.0])).astype(np.float32)
    return da, db, ua, ub


def stage_fn(stage):
    @functools.partial(jax.jit, static_argnames=())
    def fn(da, db, ua, ub, na, nb, keys):
        def one(a, b, xa, xb, n1, n2, key):
            row_d, row_i, col_d, col_i = knn.knn_top2(a, b, bf16=True)
            if stage == "knn":
                return jnp.sum(row_d[:, 0]) + jnp.sum(col_d)
            arange_a = jnp.arange(a.shape[0], dtype=jnp.int32)
            best_j = row_i[:, 0]
            d1 = jnp.maximum(row_d[:, 0], 0.0)
            d2 = jnp.maximum(row_d[:, 1], 0.0)
            ok = d1 < 0.5625 * d2
            ok &= col_i[best_j] == arange_a
            ok &= arange_a < n1
            ok &= best_j < n2
            pb = jnp.take_along_axis(xb, best_j[:, None], axis=0)
            if stage == "glue":
                return jnp.sum(jnp.where(ok, pb[:, 0], 0.0))
            pa_n, Ta = ransac._normalize_2d(xa, ok)
            pb_n, Tb = ransac._normalize_2d(pb, ok)
            ranks = ransac._valid_cumsum(ok)
            sub, sub_ok = ransac._score_subset(ok, ranks, 512)
            idx = ransac._sample_from_subset(key, sub, ranks[-1], 512, 4)
            if stage == "sample":
                return jnp.sum(idx) + jnp.sum(sub)
            Hs = ransac._homography_4pt_batched(pa_n[idx], pb_n[idx])
            if stage == "solve":
                return jnp.sum(jnp.where(jnp.isfinite(Hs), Hs, 0.0))
            errs = jax.vmap(lambda H: ransac._homography_error(
                H, pa_n[sub], pb_n[sub]))(Hs)
            t_norm = THRESH * Tb[0, 0]
            scores = jnp.sum((errs < t_norm) & sub_ok[None, :], axis=1)
            best = jnp.argmax(scores)
            if stage == "score":
                return jnp.sum(scores) + best
            H_best = Hs[best]

            def refine(H, _):
                e = ransac._homography_error(H, pa_n, pb_n)
                w = ((e < t_norm) & ok).astype(xa.dtype)
                return ransac._homography_dlt(pa_n, pb_n, w), None

            H_ref, _ = jax.lax.scan(refine, H_best, None, length=2)
            err = ransac._homography_error(H_ref, pa_n, pb_n)
            inl = (err < t_norm) & ok
            return jnp.sum(inl)

        r = jax.vmap(one)(da, db, ua, ub, na, nb, keys)
        return jnp.sum(r.astype(jnp.float32))
    return fn


def main():
    rng = np.random.default_rng(0)
    da, db, ua, ub = make_batch(rng)
    na = jnp.full(BATCH, N_FEAT, jnp.int32)
    nb = jnp.full(BATCH, N_FEAT, jnp.int32)
    args = [jnp.asarray(x) for x in (da, db, ua, ub)] + [na, nb]

    prev = 0.0
    for stage in ("knn", "glue", "sample", "solve", "score", "refine"):
        fn = stage_fn(stage)
        keys = jax.random.split(jax.random.PRNGKey(0), BATCH)
        acc = fn(*args, keys)
        float(acc)          # compile + settle
        t0 = time.perf_counter()
        acc = jnp.float32(0.0)
        for s in range(STEPS):
            keys = jax.random.split(jax.random.PRNGKey(s + 1), BATCH)
            acc = acc + fn(*args, keys)
        float(acc)          # ONE dependent download syncs the whole chain
        dt = (time.perf_counter() - t0) / STEPS
        ms = dt * 1000.0
        print(f"{stage:7s}: {ms:7.2f} ms/batch  (+{ms - prev:6.2f})  "
              f"{BATCH / dt:7.1f} pairs/s", flush=True)
        prev = ms


if __name__ == "__main__":
    main()
