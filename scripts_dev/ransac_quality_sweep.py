"""Quality (not speed) sweep of ransac_homography knobs.

Is n_hyp=256 / score_points<=512 safe at LOW inlier fractions? Mission
survivors (ratio+mutual) are usually >60% inliers, but repetitive-texture
and low-overlap pairs can drop much lower — the knobs must not lose those
pairs. Recall = recovered true inliers / planted true inliers, averaged
over B=64 independent pairs per config; run on-device (CPU contention
does not affect results, only wall time).
"""
import numpy as np
import jax
import jax.numpy as jnp

from imageanalysis_tpu.ops import ransac

print("backend:", jax.default_backend(), flush=True)
B, N = 64, 6144

for w_frac in (0.8, 0.5, 0.3, 0.2, 0.1):
    rng = np.random.default_rng(42)
    n_valid = 1500
    pa = rng.uniform(0, 4000, (B, N, 2)).astype(np.float32)
    pb = np.zeros_like(pa)
    H_true = np.array([[1.02, 0.01, 25.0], [-0.01, 0.98, -40.0],
                       [1e-6, -1e-6, 1.0]])
    ph = np.concatenate([pa, np.ones((B, N, 1))], axis=-1) @ H_true.T
    pb_good = (ph[..., :2] / ph[..., 2:3]
               + rng.normal(0, 0.5, (B, N, 2))).astype(np.float32)
    pb_bad = rng.uniform(0, 4000, (B, N, 2)).astype(np.float32)
    is_in = np.zeros((B, N), bool)
    is_in[:, :n_valid] = rng.random((B, n_valid)) < w_frac
    valid = np.zeros((B, N), bool)
    valid[:, :n_valid] = True
    pb = np.where(is_in[..., None], pb_good, pb_bad)
    keys = jax.random.split(jax.random.PRNGKey(0), B)

    for n_hyp in (256, 512):
        for sp in (256, 512, 1024):
            f = jax.jit(jax.vmap(lambda k, a, b, v: ransac.ransac_homography(
                k, a, b, v, thresh=7.9, n_hyp=n_hyp, score_points=sp)),
                static_argnames=())
            res = f(keys, jnp.asarray(pa), jnp.asarray(pb),
                    jnp.asarray(valid))
            inl = np.asarray(res.inliers)
            recall = (inl & is_in).sum() / max(is_in.sum(), 1)
            false_in = (inl & ~is_in & valid).sum() / max(inl.sum(), 1)
            # per-pair failure: pairs recovering <50% of their true inliers
            per_pair = (inl & is_in).sum(1) / np.maximum(is_in.sum(1), 1)
            fails = int((per_pair < 0.5).sum())
            print(f"w={w_frac:.1f} h{n_hyp:4d} sp{sp:5d}: recall "
                  f"{recall:.3f} false-inl {false_in:.3f} "
                  f"failed-pairs {fails}/64", flush=True)
print("DONE")
