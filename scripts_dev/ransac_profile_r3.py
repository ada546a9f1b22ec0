"""Sub-stage profile of ransac_homography at bench shapes (B=64, N=6144).

Times cumulative prefixes of the pipeline, each as its own jit, using the
chained-scalar sync protocol. Differences between rows attribute time.
"""
import time
import numpy as np
import jax
import jax.numpy as jnp

from imageanalysis_tpu.ops import ransac

print("backend:", jax.default_backend(), flush=True)
B, N, HYP, SP = 64, 6144, 512, 1024
rng = np.random.default_rng(0)
pa = rng.uniform(0, 4000, (B, N, 2)).astype(np.float32)
pb = (pa * np.array([1.02, 0.98]) + np.array([25.0, -40.0])
      + rng.normal(0, 0.5, pa.shape)).astype(np.float32)
valid = (rng.random((B, N)) < 0.25)
pa_j, pb_j = jnp.asarray(pa), jnp.asarray(pb)
valid_j = jnp.asarray(valid)
keys = jax.random.split(jax.random.PRNGKey(0), B)


def stage(upto):
    def one(key, pts_a, pts_b, valid):
        pa_n, Ta = ransac._normalize_2d(pts_a, valid)
        pb_n, Tb = ransac._normalize_2d(pts_b, valid)
        if upto == "norm":
            return jnp.sum(pa_n) + jnp.sum(Tb)
        ranks = ransac._valid_cumsum(valid)
        idx = ransac._sample_indices(key, valid, HYP, 4, ranks=ranks)
        if upto == "sample":
            return jnp.sum(idx)
        Hs = jax.vmap(lambda i: ransac._homography_4pt(pa_n[i], pb_n[i]))(idx)
        if upto == "solve":
            return jnp.sum(jnp.nan_to_num(Hs, posinf=0, neginf=0))
        sub, sub_ok = ransac._score_subset(valid, ranks, SP)
        errs = jax.vmap(lambda H: ransac._homography_error(
            H, pa_n[sub], pb_n[sub]))(Hs)
        t_norm = 3.0 * Tb[0, 0]
        scores = jnp.sum((errs < t_norm) & sub_ok[None, :], axis=1)
        if upto == "score":
            return jnp.sum(scores)
        best = jnp.argmax(scores)
        H_best = Hs[best]

        def refine(H, _):
            e = ransac._homography_error(H, pa_n, pb_n)
            w = ((e < t_norm) & valid).astype(pts_a.dtype)
            H_new = ransac._homography_dlt(pa_n, pb_n, w)
            return H_new, None
        H_ref, _ = jax.lax.scan(refine, H_best, None, length=2)
        if upto == "refine":
            return jnp.sum(jnp.nan_to_num(H_ref, posinf=0, neginf=0))
        err = ransac._homography_error(H_ref, pa_n, pb_n)
        inl = (err < t_norm) & valid
        H_full = jnp.linalg.inv(Tb) @ H_ref @ Ta
        return jnp.sum(inl) + jnp.sum(jnp.nan_to_num(H_full, posinf=0,
                                                     neginf=0))

    @jax.jit
    def f(keys, pa, pb, valid):
        return jnp.sum(jax.vmap(one)(keys, pa, pb, valid))
    return f


STEPS = 16
prev = 0.0
for name in ("norm", "sample", "solve", "score", "refine", "full"):
    f = stage(name)
    float(f(keys, pa_j, pb_j, valid_j))   # compile+warm
    t0 = time.perf_counter()
    accs = [f(keys, pa_j, pb_j, valid_j) for _ in range(STEPS)]
    total = float(sum(accs))
    dt = (time.perf_counter() - t0) / STEPS * 1000
    print(f"{name:8s}: {dt:7.2f} ms/batch  (+{dt-prev:6.2f})  chk={total:.3g}",
          flush=True)
    prev = dt
print("DONE")
