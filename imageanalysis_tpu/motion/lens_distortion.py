"""Lens distortion estimation from video motion.

Reference motion/6-estimate-lens-distortion.py (229 LoC): radial distortion
makes frame-to-frame motion deviate from a pure homography away from the
image center; search for the coefficients that make the tracked flow
homography-consistent.

TPU-native formulation: collect LK tracks over many frame pairs, then
minimize Σ‖H_i(undistort(p)) − undistort(q)‖² jointly over (k1, k2) and the
per-pair similarity transforms by gradient descent through the
differentiable undistortion (core.camera.undistort_normalized) — one jitted
optimization instead of the reference's grid search.
"""

from __future__ import annotations

import numpy as np


def estimate_k1_k2(track_pairs, K, iters=300, lr=3e-2):
    """track_pairs: list of (pts_a (N,2), pts_b (N,2)) pixel tracks from
    frame pairs. Returns (k1, k2, history)."""
    import jax
    import jax.numpy as jnp
    import optax

    from ..core.camera import pixels_to_normalized, undistort_normalized
    from ..core.transforms import fit_similarity_2d

    npad = max(len(a) for a, _ in track_pairs)
    B = len(track_pairs)
    pa = np.zeros((B, npad, 2), np.float32)
    pb = np.zeros((B, npad, 2), np.float32)
    w = np.zeros((B, npad), np.float32)
    for i, (a, b) in enumerate(track_pairs):
        n = len(a)
        pa[i, :n], pb[i, :n], w[i, :n] = a, b, 1.0
    pa = jnp.asarray(pa)
    pb = jnp.asarray(pb)
    w = jnp.asarray(w)
    Kj = jnp.asarray(K, dtype=jnp.float32)
    f = 0.5 * float(K[0, 0] + K[1, 1])

    na = pixels_to_normalized(pa, Kj)
    nb = pixels_to_normalized(pb, Kj)

    def loss(params):
        dist = jnp.array([params[0], params[1], 0.0, 0.0, 0.0])
        ua = undistort_normalized(na, dist, iters=6)
        ub = undistort_normalized(nb, dist, iters=6)

        def pair_resid(a, b, wi):
            A = fit_similarity_2d(a, b, wi)
            pred = a @ A[:, :2].T + A[:, 2]
            return jnp.sum(wi * jnp.sum((pred - b) ** 2, -1)) / jnp.maximum(
                jnp.sum(wi), 1.0)

        r = jax.vmap(pair_resid)(ua, ub, w)
        return jnp.mean(r) * f * f  # scale to px²

    params = jnp.zeros(2)
    opt = optax.adam(lr)
    state = opt.init(params)
    grad_fn = jax.jit(jax.value_and_grad(loss))
    history = []
    for _ in range(iters):
        val, g = grad_fn(params)
        updates, state = opt.update(g, state)
        params = optax.apply_updates(params, updates)
        history.append(float(val))
    k1, k2 = (float(v) for v in params)
    return k1, k2, history


def estimate_from_video(video_path, K, max_frames=120, scale=1.0):
    """End-to-end: track → optimize → (k1, k2)."""
    from ..video.frame_motion import track_video

    pairs = [(p0, p1) for _, _, p0, p1 in
             track_video(video_path, max_frames=max_frames, scale=scale)]
    if len(pairs) < 5:
        raise ValueError("not enough trackable frames")
    k1, k2, hist = estimate_k1_k2(pairs, K)
    return k1, k2, hist
