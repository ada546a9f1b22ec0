"""Minimal `transformations` (Gohlke) shim for the reference pipeline.

The reference uses Christoph Gohlke's transformations.py for quaternion /
Euler / similarity-fit math (reference camera.py:138, image.py:412-546,
optimizer.py:43-605, pose.py:147-148, project.py:370). That package is not
installed here, so this shim implements the ten functions the reference's
canonical path calls, written from the documented conventions (w-first
quaternions, Shoemake axes strings) with scipy.spatial.transform doing the
Euler-sequence work:

    unit_vector, quaternion_from_euler, euler_from_quaternion,
    quaternion_multiply, quaternion_matrix, rotation_matrix,
    euler_matrix, euler_from_matrix, decompose_matrix,
    superimposition_matrix

Axes strings: 's' prefix = static/extrinsic frame, 'r' = rotating/intrinsic;
e.g. 'rzyx' is intrinsic yaw-pitch-roll (aerospace), 'sxyz' is the default.
Quaternions are [w, x, y, z] like Gohlke's, unlike scipy's [x, y, z, w].
"""

from __future__ import annotations

import math

import numpy as np
from scipy.spatial.transform import Rotation as _R

_EPS = np.finfo(np.float64).eps * 4.0


def _seq(axes: str) -> str:
    """Map a Gohlke axes string to a scipy Rotation euler sequence."""
    if len(axes) != 4 or axes[0] not in "sr":
        raise ValueError(f"unsupported axes spec: {axes!r}")
    order = axes[1:]
    return order.upper() if axes[0] == "r" else order.lower()


def unit_vector(data, axis=None, out=None):
    v = np.array(data, dtype=np.float64, copy=True)
    if axis is None and out is None:
        n = math.sqrt(float(np.dot(v.ravel(), v.ravel())))
        return v / n
    length = np.atleast_1d(np.sum(v * v, axis))
    np.sqrt(length, length)
    if axis is not None:
        length = np.expand_dims(length, axis)
    v /= length
    if out is not None:
        out[...] = v
        return None
    return v


def quaternion_from_euler(ai, aj, ak, axes="sxyz"):
    q = _R.from_euler(_seq(axes), [ai, aj, ak]).as_quat()  # x, y, z, w
    q = np.array([q[3], q[0], q[1], q[2]], dtype=np.float64)
    # Gohlke's construction keeps w >= 0 for sxyz/rzyx half-angle products
    return q


def euler_from_quaternion(quaternion, axes="sxyz"):
    q = np.asarray(quaternion, dtype=np.float64)
    r = _R.from_quat([q[1], q[2], q[3], q[0]])
    return tuple(r.as_euler(_seq(axes)))


def euler_matrix(ai, aj, ak, axes="sxyz"):
    M = np.identity(4)
    M[:3, :3] = _R.from_euler(_seq(axes), [ai, aj, ak]).as_matrix()
    return M


def euler_from_matrix(matrix, axes="sxyz"):
    M = np.asarray(matrix, dtype=np.float64)[:3, :3]
    return tuple(_R.from_matrix(M).as_euler(_seq(axes)))


def quaternion_multiply(quaternion1, quaternion0):
    """Hamilton product q1 * q0, both [w, x, y, z]."""
    w0, x0, y0, z0 = quaternion0
    w1, x1, y1, z1 = quaternion1
    return np.array([
        w1 * w0 - x1 * x0 - y1 * y0 - z1 * z0,
        w1 * x0 + x1 * w0 + y1 * z0 - z1 * y0,
        w1 * y0 - x1 * z0 + y1 * w0 + z1 * x0,
        w1 * z0 + x1 * y0 - y1 * x0 + z1 * w0,
    ], dtype=np.float64)


def quaternion_about_axis(angle, axis):
    """Quaternion [w, x, y, z] for rotation by *angle* about *axis*
    (reference hud_glass.py:10,716 uses it for the heading-bug azimuth)."""
    a = unit_vector(np.asarray(axis, dtype=np.float64)[:3])
    return np.concatenate(([math.cos(angle / 2.0)],
                           a * math.sin(angle / 2.0)))


def quaternion_transform(quaternion, vector):
    """Transform *vector* INTO the frame rotated by *quaternion*
    ([w, x, y, z]) — i.e. R(q)^T v. This is the reference's own extension
    (scripts/lib/archive/transformations.py:1603-1612), used by the HUD
    ar/cam helpers (hud_glass.py:348-373)."""
    M = quaternion_matrix(quaternion)
    return M[:3, :3].T @ np.asarray(vector, dtype=np.float64)[:3]


def quaternion_matrix(quaternion):
    """4x4 homogeneous rotation matrix from [w, x, y, z] quaternion."""
    q = np.asarray(quaternion, dtype=np.float64).copy()
    n = float(np.dot(q, q))
    if n < _EPS:
        return np.identity(4)
    q *= math.sqrt(2.0 / n)
    q = np.outer(q, q)
    M = np.identity(4)
    M[:3, :3] = [
        [1.0 - q[2, 2] - q[3, 3], q[1, 2] - q[3, 0], q[1, 3] + q[2, 0]],
        [q[1, 2] + q[3, 0], 1.0 - q[1, 1] - q[3, 3], q[2, 3] - q[1, 0]],
        [q[1, 3] - q[2, 0], q[2, 3] + q[1, 0], 1.0 - q[1, 1] - q[2, 2]],
    ]
    return M


def rotation_matrix(angle, direction, point=None):
    """4x4 matrix rotating about *direction* through *point* by *angle*."""
    d = unit_vector(np.asarray(direction, dtype=np.float64)[:3])
    sa, ca = math.sin(angle), math.cos(angle)
    R = np.diag([ca, ca, ca]) + np.outer(d, d) * (1.0 - ca)
    R += np.array([[0.0, -d[2], d[1]],
                   [d[2], 0.0, -d[0]],
                   [-d[1], d[0], 0.0]]) * sa
    M = np.identity(4)
    M[:3, :3] = R
    if point is not None:
        p = np.asarray(point, dtype=np.float64)[:3]
        M[:3, 3] = p - R @ p
    return M


def decompose_matrix(matrix):
    """Split a 4x4 into (scale, shear, angles, translate, perspective).

    angles follow the 'sxyz' convention so euler_matrix(*angles)
    reconstructs the rotation (reference optimizer.py:599-605 relies on
    this to pull the rotation out of a similarity fit).
    """
    M = np.array(matrix, dtype=np.float64, copy=True)
    if abs(M[3, 3]) < _EPS:
        raise ValueError("M[3, 3] is zero")
    M /= M[3, 3]
    perspective = np.array([0.0, 0.0, 0.0, 1.0])
    if np.any(np.abs(M[3, :3]) > _EPS):
        # general perspective solve: rows of M.T against last column basis
        P = M.copy()
        P[3] = [0.0, 0.0, 0.0, 1.0]
        perspective = np.linalg.solve(P.T, M[3])
    translate = M[:3, 3].copy()
    A = M[:3, :3].copy()
    # QR-style Gram-Schmidt on columns: A = R @ upper-tri(shear * scale)
    scale = np.zeros(3)
    shear = np.zeros(3)
    scale[0] = np.linalg.norm(A[:, 0])
    A[:, 0] /= scale[0]
    shear[0] = float(A[:, 0] @ A[:, 1])           # xy
    A[:, 1] -= shear[0] * A[:, 0]
    scale[1] = np.linalg.norm(A[:, 1])
    A[:, 1] /= scale[1]
    shear[0] /= scale[1]
    shear[1] = float(A[:, 0] @ A[:, 2])           # xz
    A[:, 2] -= shear[1] * A[:, 0]
    shear[2] = float(A[:, 1] @ A[:, 2])           # yz
    A[:, 2] -= shear[2] * A[:, 1]
    scale[2] = np.linalg.norm(A[:, 2])
    A[:, 2] /= scale[2]
    shear[1:] /= scale[2]
    if np.linalg.det(A) < 0:
        scale = -scale
        A = -A
    angles = euler_from_matrix(A, "sxyz")
    return scale, shear, angles, translate, perspective


def superimposition_matrix(v0, v1, scale=False, usesvd=True):
    """4x4 similarity transform M with M @ v0 ~= v1 (Umeyama fit).

    v0/v1: (3, N) or (4, N) point columns, N >= 3 (reference
    optimizer.py:27-48 passes homogeneous (4, N) lists).
    """
    src = np.asarray(v0, dtype=np.float64)[:3]
    dst = np.asarray(v1, dtype=np.float64)[:3]
    if src.shape != dst.shape or src.shape[1] < 3:
        raise ValueError("point sets must match and have >= 3 points")
    mu0 = src.mean(axis=1, keepdims=True)
    mu1 = dst.mean(axis=1, keepdims=True)
    x0 = src - mu0
    x1 = dst - mu1
    cov = x1 @ x0.T / src.shape[1]
    U, D, Vt = np.linalg.svd(cov)
    S = np.identity(3)
    if np.linalg.det(U) * np.linalg.det(Vt) < 0:
        S[2, 2] = -1.0
    R = U @ S @ Vt
    if scale:
        var0 = float((x0 * x0).sum()) / src.shape[1]
        s = float(np.trace(np.diag(D) @ S)) / var0
    else:
        s = 1.0
    M = np.identity(4)
    M[:3, :3] = s * R
    M[:3, 3] = (mu1 - s * R @ mu0).ravel()
    return M
