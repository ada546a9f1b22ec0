"""Triangulation: two-view DLT and N-ray least-squares intersection.

Replaces cv2.triangulatePoints (reference smart.py:61 ``triangulate_features``)
and ls_lines_intersection (reference line_solver.py:7-38, used by
3c-match-triangulation.py's ``--method triangulate``). Batched over points via
trailing-dim conventions; masked for ragged chains.
"""

from __future__ import annotations

import jax.numpy as jnp


def projection_matrix(R, t, K):
    """P = K [R | t], (…,3,4)."""
    Rt = jnp.concatenate([R, t[..., None]], axis=-1)
    return K @ Rt


def triangulate_two_view(P1, P2, uv1, uv2, gn_iters=2):
    """DLT triangulation of correspondences seen by two cameras.

    P1/P2: (3,4) projection matrices; uv1/uv2: (N,2) pixel coords
    (undistorted). Returns (N,3) points — cv2.triangulatePoints equivalent.
    Solves the 4×4 homogeneous system per point via eigh of AᵀA, then applies
    ``gn_iters`` Gauss–Newton reprojection refinements — the DLT alone at
    float32 loses ~0.2 m on poorly conditioned points; GN restores it.
    """
    def rows(P, uv):
        # u·P[2] − P[0],  v·P[2] − P[1]
        r0 = uv[..., 0:1] * P[2][None, :] - P[0][None, :]
        r1 = uv[..., 1:2] * P[2][None, :] - P[1][None, :]
        return r0, r1

    a0, a1 = rows(P1, uv1)
    b0, b1 = rows(P2, uv2)
    A = jnp.stack([a0, a1, b0, b1], axis=-2)  # (N, 4, 4)
    # row normalization for conditioning
    A = A / jnp.maximum(jnp.linalg.norm(A, axis=-1, keepdims=True), 1e-12)
    AtA = jnp.einsum("...ki,...kj->...ij", A, A)
    _, vecs = jnp.linalg.eigh(AtA)
    X = vecs[..., :, 0]
    w = X[..., 3]
    w = jnp.where(jnp.abs(w) < 1e-12, 1e-12, w)
    pts = X[..., :3] / w[..., None]

    def residual_jac(P, uv, p):
        q = p @ P[:, :3].T + P[:, 3]           # (N, 3)
        z = jnp.where(jnp.abs(q[..., 2]) < 1e-9, 1e-9, q[..., 2])
        u = q[..., :2] / z[..., None]
        r = u - uv                              # (N, 2)
        J = (P[None, :2, :3] - u[..., None] * P[None, 2:3, :3]) / z[..., None, None]
        return r, J

    for _ in range(gn_iters):
        r1, J1 = residual_jac(P1, uv1, pts)
        r2, J2 = residual_jac(P2, uv2, pts)
        J = jnp.concatenate([J1, J2], axis=-2)  # (N, 4, 3)
        r = jnp.concatenate([r1, r2], axis=-1)  # (N, 4)
        JtJ = jnp.einsum("...ki,...kj->...ij", J, J) + 1e-9 * jnp.eye(3)
        Jtr = jnp.einsum("...ki,...k->...i", J, r)
        pts = pts - jnp.linalg.solve(JtJ, Jtr[..., None])[..., 0]
    return pts


def triangulate_rays(origins, dirs, mask=None):
    """Least-squares point closest to N rays (origin + s·dir).

    origins/dirs: (..., N, 3); mask: (..., N) bool for ragged chains.
    Minimizes Σᵢ ‖(I − dᵢdᵢᵀ)(p − oᵢ)‖² — the reference's
    ls_lines_intersection (line_solver.py:7-38). Returns (..., 3).
    """
    d = dirs / jnp.maximum(jnp.linalg.norm(dirs, axis=-1, keepdims=True), 1e-12)
    eye = jnp.eye(3, dtype=origins.dtype)
    Pm = eye - d[..., :, None] * d[..., None, :]  # (..., N, 3, 3)
    if mask is not None:
        Pm = Pm * mask[..., None, None]
    A = jnp.sum(Pm, axis=-3)                       # (..., 3, 3)
    b = jnp.sum(jnp.einsum("...nij,...nj->...ni", Pm, origins), axis=-2)
    # regularize in case of degenerate (parallel) rays
    A = A + 1e-9 * eye
    return jnp.linalg.solve(A, b[..., None])[..., 0]


def reprojection_depths(R, t, pts):
    """Camera-frame z of NED points (positive = in front)."""
    return (jnp.einsum("...ij,...j->...i", R, pts) + t)[..., 2]
