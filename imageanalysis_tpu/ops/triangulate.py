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


def solve3x3(A, b):
    """Closed-form batched 3×3 solve via the adjugate.

    jnp.linalg.solve lowers to a general LU kernel whose TPU executable
    compiles for minutes at mission batch shapes; the cofactor formula is
    a handful of fused multiplies. A: (..., 3, 3), b: (..., 3)."""
    a00, a01, a02 = A[..., 0, 0], A[..., 0, 1], A[..., 0, 2]
    a10, a11, a12 = A[..., 1, 0], A[..., 1, 1], A[..., 1, 2]
    a20, a21, a22 = A[..., 2, 0], A[..., 2, 1], A[..., 2, 2]
    c00 = a11 * a22 - a12 * a21
    c01 = a02 * a21 - a01 * a22
    c02 = a01 * a12 - a02 * a11
    c10 = a12 * a20 - a10 * a22
    c11 = a00 * a22 - a02 * a20
    c12 = a02 * a10 - a00 * a12
    c20 = a10 * a21 - a11 * a20
    c21 = a01 * a20 - a00 * a21
    c22 = a00 * a11 - a01 * a10
    det = a00 * c00 + a01 * c01 + a02 * c02
    det = jnp.where(jnp.abs(det) < 1e-20, 1e-20, det)
    x0 = c00 * b[..., 0] + c01 * b[..., 1] + c02 * b[..., 2]
    x1 = c10 * b[..., 0] + c11 * b[..., 1] + c12 * b[..., 2]
    x2 = c20 * b[..., 0] + c21 * b[..., 1] + c22 * b[..., 2]
    return jnp.stack([x0, x1, x2], axis=-1) / det[..., None]


def triangulate_two_view(P1, P2, uv1, uv2, gn_iters=2):
    """DLT triangulation of correspondences seen by two cameras.

    P1/P2: (3,4) projection matrices; uv1/uv2: (N,2) pixel coords
    (undistorted). Returns (N,3) points — cv2.triangulatePoints equivalent.
    Initializes with the inhomogeneous DLT (w=1): the 4×3 system solved by
    3×3 normal equations in closed form, then applies ``gn_iters``
    Gauss–Newton reprojection refinements. (A 4×4 eigh init is marginally
    more robust for points at infinity — irrelevant for terrain — but its
    TPU executable compiles in minutes and loads in tens of seconds; the
    closed-form solve compiles in seconds and GN recovers the accuracy.)
    """
    def rows(P, uv):
        # u·P[2] − P[0],  v·P[2] − P[1]
        r0 = uv[..., 0:1] * P[2][None, :] - P[0][None, :]
        r1 = uv[..., 1:2] * P[2][None, :] - P[1][None, :]
        return r0, r1

    a0, a1 = rows(P1, uv1)
    b0, b1 = rows(P2, uv2)
    A4 = jnp.stack([a0, a1, b0, b1], axis=-2)  # (N, 4, 4)
    # row normalization for conditioning
    A4 = A4 / jnp.maximum(jnp.linalg.norm(A4, axis=-1, keepdims=True), 1e-12)
    A = A4[..., :3]                            # (N, 4, 3)
    b = -A4[..., 3]                            # (N, 4)
    AtA = jnp.einsum("...ki,...kj->...ij", A, A) + 1e-12 * jnp.eye(3)
    Atb = jnp.einsum("...ki,...k->...i", A, b)
    pts = solve3x3(AtA, Atb)

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
        pts = pts - solve3x3(JtJ, Jtr)
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
    return solve3x3(A, b)


def reprojection_depths(R, t, pts):
    """Camera-frame z of NED points (positive = in front)."""
    return (jnp.einsum("...ij,...j->...i", R, pts) + t)[..., 2]
