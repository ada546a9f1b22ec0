"""Point-set alignment transforms: Umeyama similarity, 2-D affine/similarity.

Replaces transformations.superimposition_matrix (reference optimizer.py:583-683
``refit`` GPS re-registration) and cv2.estimateAffinePartial2D (reference
smart.py:66-114 ``find_affine`` yaw-error estimation; video/1a affine
decomposition). Pure jnp, weighted, batched, differentiable.
"""

from __future__ import annotations

import jax.numpy as jnp


def umeyama(src, dst, weights=None, with_scale=True):
    """Weighted Umeyama alignment: find (s, R, t) minimizing Σw‖dst−(sR·src+t)‖².

    src, dst: (N, 3) (or (N, 2)); returns (scale, R, t). Equivalent to
    transformations.superimposition_matrix(src.T, dst.T, scale=True) used by
    the reference to re-register optimized cameras onto GPS positions
    (optimizer.py:606-612).
    """
    src = jnp.asarray(src)
    dst = jnp.asarray(dst)
    n, d = src.shape[-2], src.shape[-1]
    if weights is None:
        w = jnp.full(src.shape[:-1], 1.0 / n, dtype=src.dtype)
    else:
        w = weights / jnp.sum(weights, axis=-1, keepdims=True)
    mu_s = jnp.einsum("...n,...ni->...i", w, src)
    mu_d = jnp.einsum("...n,...ni->...i", w, dst)
    sc = src - mu_s[..., None, :]
    dc = dst - mu_d[..., None, :]
    cov = jnp.einsum("...n,...ni,...nj->...ij", w, dc, sc)  # dst×srcᵀ
    U, S, Vt = jnp.linalg.svd(cov)
    # reflection guard
    det = jnp.linalg.det(U) * jnp.linalg.det(Vt)
    sign = jnp.where(det < 0, -1.0, 1.0)
    D = jnp.concatenate(
        [jnp.ones(S.shape[:-1] + (d - 1,), dtype=src.dtype), sign[..., None]], axis=-1)
    R = jnp.einsum("...ik,...k,...kj->...ij", U, D, Vt)
    var_s = jnp.einsum("...n,...ni,...ni->...", w, sc, sc)
    if with_scale:
        scale = jnp.einsum("...k,...k->...", S, D) / jnp.maximum(var_s, 1e-12)
    else:
        scale = jnp.ones_like(var_s)
    t = mu_d - scale[..., None] * jnp.einsum("...ij,...j->...i", R, mu_s)
    return scale, R, t


def apply_similarity(scale, R, t, pts):
    return scale[..., None, None] * jnp.einsum("...ij,...nj->...ni", R, pts) + t[..., None, :]


def fit_similarity_2d(src, dst, weights=None):
    """Weighted LS 2-D similarity (rotation+uniform scale+translation).

    Closed form for the 4-parameter [[a,-b],[b,a]] + t model —
    cv2.estimateAffinePartial2D's inner solve (reference smart.py:87).
    Returns the 2×3 matrix [[a,-b,tx],[b,a,ty]].
    """
    src = jnp.asarray(src)
    dst = jnp.asarray(dst)
    n = src.shape[-2]
    if weights is None:
        w = jnp.full(src.shape[:-1], 1.0 / n, dtype=src.dtype)
    else:
        w = weights / jnp.maximum(jnp.sum(weights, axis=-1, keepdims=True), 1e-12)
    mu_s = jnp.einsum("...n,...ni->...i", w, src)
    mu_d = jnp.einsum("...n,...ni->...i", w, dst)
    sc = src - mu_s[..., None, :]
    dc = dst - mu_d[..., None, :]
    var = jnp.einsum("...n,...ni,...ni->...", w, sc, sc)
    sxx = jnp.einsum("...n,...n,...n->...", w, sc[..., 0], dc[..., 0])
    syy = jnp.einsum("...n,...n,...n->...", w, sc[..., 1], dc[..., 1])
    sxy = jnp.einsum("...n,...n,...n->...", w, sc[..., 0], dc[..., 1])
    syx = jnp.einsum("...n,...n,...n->...", w, sc[..., 1], dc[..., 0])
    a = (sxx + syy) / jnp.maximum(var, 1e-12)
    b = (sxy - syx) / jnp.maximum(var, 1e-12)
    tx = mu_d[..., 0] - (a * mu_s[..., 0] - b * mu_s[..., 1])
    ty = mu_d[..., 1] - (b * mu_s[..., 0] + a * mu_s[..., 1])
    row0 = jnp.stack([a, -b, tx], axis=-1)
    row1 = jnp.stack([b, a, ty], axis=-1)
    return jnp.stack([row0, row1], axis=-2)


def decompose_affine_2d(A):
    """2×3 affine → (rotation_rad, tx, ty, scale_x, scale_y).

    Matches the reference's decomposeAffine (video/1a-est-gyro-rates.py:138-160
    and smart.py:97-107): rotation from atan2 of the first column, scales as
    column norms with sign from the determinant.
    """
    a, b = A[..., 0, 0], A[..., 1, 0]
    c, d = A[..., 0, 1], A[..., 1, 1]
    tx, ty = A[..., 0, 2], A[..., 1, 2]
    sx = jnp.sqrt(a * a + b * b)
    det = a * d - b * c
    sx = sx * jnp.where(det < 0, -1.0, 1.0)
    sy = jnp.sqrt(c * c + d * d)
    rot = jnp.arctan2(b, a)
    return rot, tx, ty, sx, sy
