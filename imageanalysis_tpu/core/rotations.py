"""Rotation math: quaternions, Euler angles, axis-angle (Rodrigues).

Pure jnp, fully batchable with vmap, differentiable. Conventions match the
``transformations`` library the reference depends on (scripts/lib/image.py:15,
scripts/lib/camera.py:7):

- quaternions are ``[w, x, y, z]`` Hamilton products;
- aerospace Euler angles use the 'rzyx' order: ``quat_from_ypr(yaw, pitch,
  roll)`` equals ``transformations.quaternion_from_euler(yaw, pitch, roll,
  'rzyx')`` (reference image.py:411-413), and ``quat_to_matrix`` of that
  quaternion is the body→NED direction-cosine matrix (reference
  image.py:536-539 get_body2ned);
- ``rodrigues`` / ``rodrigues_inv`` replace cv2.Rodrigues (reference
  image.py:486, optimizer.py:84-99).

All functions accept a trailing-dim convention (shape ``(..., 4)`` quats,
``(..., 3, 3)`` matrices) so ``vmap`` is usually unnecessary.
"""

from __future__ import annotations

import jax.numpy as jnp


def quat_multiply(q1, q0):
    """Hamilton product q1 ⊗ q0 of [w,x,y,z] quaternions.

    Matches transformations.quaternion_multiply(q1, q0): the result rotates by
    q0 first, then q1, when quats act as ``quat_to_matrix(q) @ v``.
    """
    w1, x1, y1, z1 = jnp.moveaxis(q1, -1, 0)
    w0, x0, y0, z0 = jnp.moveaxis(q0, -1, 0)
    return jnp.stack(
        [
            w1 * w0 - x1 * x0 - y1 * y0 - z1 * z0,
            w1 * x0 + x1 * w0 + y1 * z0 - z1 * y0,
            w1 * y0 - x1 * z0 + y1 * w0 + z1 * x0,
            w1 * z0 + x1 * y0 - y1 * x0 + z1 * w0,
        ],
        axis=-1,
    )


def quat_conjugate(q):
    return q * jnp.asarray([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)


def quat_inverse(q):
    return quat_conjugate(q) / jnp.sum(q * q, axis=-1, keepdims=True)


def quat_normalize(q, eps=1e-12):
    return q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), eps)


def _axis_quat(angle, axis_index, ndim_like):
    """Unit quaternion for rotation by ``angle`` about coordinate axis 0/1/2."""
    angle = jnp.asarray(angle)
    half = angle * 0.5
    w = jnp.cos(half)
    s = jnp.sin(half)
    zero = jnp.zeros_like(s)
    comps = [w, zero, zero, zero]
    comps[1 + axis_index] = s
    return jnp.stack(comps, axis=-1)


def quat_from_ypr(yaw, pitch, roll):
    """NED→body attitude quaternion from aerospace yaw/pitch/roll (radians).

    Equals transformations.quaternion_from_euler(yaw, pitch, roll, 'rzyx'):
    q = qz(yaw) ⊗ qy(pitch) ⊗ qx(roll); ``quat_to_matrix`` of it is the
    body→NED DCM. Reference call sites: image.py:411-413 (aircraft/camera
    pose), camera.py:136-139 (mount body2cam).
    """
    qz = _axis_quat(yaw, 2, None)
    qy = _axis_quat(pitch, 1, None)
    qx = _axis_quat(roll, 0, None)
    return quat_multiply(quat_multiply(qz, qy), qx)


def quat_to_matrix(q):
    """3×3 rotation matrix of a [w,x,y,z] quaternion (non-unit safe).

    Matches transformations.quaternion_matrix(q)[:3,:3] — for an attitude quat
    from quat_from_ypr this is the body→NED matrix (reference image.py:536-539).
    """
    q = quat_normalize(q)
    w, x, y, z = jnp.moveaxis(q, -1, 0)
    xx, yy, zz = x * x, y * y, z * z
    wx, wy, wz = w * x, w * y, w * z
    xy, xz, yz = x * y, x * z, y * z
    m = jnp.stack(
        [
            jnp.stack([1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy)], axis=-1),
            jnp.stack([2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx)], axis=-1),
            jnp.stack([2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy)], axis=-1),
        ],
        axis=-2,
    )
    return m


def matrix_to_quat(m):
    """Rotation matrix → [w,x,y,z] quaternion (branch-free, vmap-safe).

    Uses the four-candidate construction, selecting the numerically largest
    denominator per element, so it is safe under jit for all rotations.
    """
    m = jnp.asarray(m)
    m00, m01, m02 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    m10, m11, m12 = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    m20, m21, m22 = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]
    tr = m00 + m11 + m22

    # four candidate quats (unnormalized), one per dominant diagonal term
    qw = jnp.stack([1.0 + tr, m21 - m12, m02 - m20, m10 - m01], axis=-1)
    qx = jnp.stack([m21 - m12, 1.0 + m00 - m11 - m22, m01 + m10, m02 + m20], axis=-1)
    qy = jnp.stack([m02 - m20, m01 + m10, 1.0 - m00 + m11 - m22, m12 + m21], axis=-1)
    qz = jnp.stack([m10 - m01, m02 + m20, m12 + m21, 1.0 - m00 - m11 + m22], axis=-1)

    scores = jnp.stack([1.0 + tr, 1.0 + m00 - m11 - m22,
                        1.0 - m00 + m11 - m22, 1.0 - m00 - m11 + m22], axis=-1)
    idx = jnp.argmax(scores, axis=-1)
    cands = jnp.stack([qw, qx, qy, qz], axis=-2)  # (..., 4, 4)
    q = jnp.take_along_axis(cands, idx[..., None, None].astype(jnp.int32), axis=-2)
    q = jnp.squeeze(q, axis=-2)
    q = quat_normalize(q)
    # canonical sign: w >= 0
    return q * jnp.where(q[..., :1] < 0, -1.0, 1.0)


def ypr_from_quat(q):
    """Inverse of quat_from_ypr: (yaw, pitch, roll) radians from quaternion.

    Equals transformations.euler_from_quaternion(q, 'rzyx') (reference
    pose.py:147, image.py:449).
    """
    q = quat_normalize(q)
    w, x, y, z = jnp.moveaxis(q, -1, 0)
    yaw = jnp.arctan2(2 * (w * z + x * y), 1 - 2 * (y * y + z * z))
    sinp = jnp.clip(2 * (w * y - z * x), -1.0, 1.0)
    pitch = jnp.arcsin(sinp)
    roll = jnp.arctan2(2 * (w * x + y * z), 1 - 2 * (x * x + y * y))
    return yaw, pitch, roll


def rotation_matrix(angle, axis):
    """3×3 rotation by ``angle`` (radians) about arbitrary ``axis``.

    Equals transformations.rotation_matrix(angle, axis)[:3,:3] (reference
    image.py:555 uses it for the yaw-error pre-rotation).
    """
    axis = jnp.asarray(axis, dtype=jnp.result_type(float))
    axis = axis / jnp.linalg.norm(axis, axis=-1, keepdims=True)
    return rodrigues(axis * jnp.asarray(angle)[..., None])


def rodrigues(rvec):
    """Axis-angle vector → rotation matrix (cv2.Rodrigues forward).

    Taylor-guarded at θ→0 so it is differentiable everywhere; replaces
    cv2.Rodrigues at reference image.py:486, optimizer.py:95.
    """
    rvec = jnp.asarray(rvec)
    theta2 = jnp.sum(rvec * rvec, axis=-1)
    theta = jnp.sqrt(theta2 + 1e-24)
    k = rvec / theta[..., None]
    kx, ky, kz = k[..., 0], k[..., 1], k[..., 2]
    zero = jnp.zeros_like(kx)
    K = jnp.stack(
        [
            jnp.stack([zero, -kz, ky], axis=-1),
            jnp.stack([kz, zero, -kx], axis=-1),
            jnp.stack([-ky, kx, zero], axis=-1),
        ],
        axis=-2,
    )
    eye = jnp.broadcast_to(jnp.eye(3, dtype=rvec.dtype), K.shape)
    small = theta2 < 1e-12
    th = theta[..., None, None]
    R_full = eye + jnp.sin(th) * K + (1 - jnp.cos(th)) * (K @ K)
    R_small = eye + th * K  # first order
    return jnp.where(small[..., None, None], R_small, R_full)


def rodrigues_inv(R):
    """Rotation matrix → axis-angle vector (cv2.Rodrigues inverse).

    Branch-free: uses the quaternion route, stable at θ≈0 and θ≈π.
    """
    q = matrix_to_quat(R)
    w = jnp.clip(q[..., 0], -1.0, 1.0)
    v = q[..., 1:]
    sin_half = jnp.linalg.norm(v, axis=-1)
    theta = 2.0 * jnp.arctan2(sin_half, w)
    axis = v / jnp.maximum(sin_half, 1e-12)[..., None]
    return axis * theta[..., None]


def quat_slerp(q0, q1, t):
    """Spherical linear interpolation between unit quaternions."""
    q0 = quat_normalize(q0)
    q1 = quat_normalize(q1)
    d = jnp.sum(q0 * q1, axis=-1, keepdims=True)
    q1 = jnp.where(d < 0, -q1, q1)
    d = jnp.abs(jnp.clip(d, -1.0, 1.0))
    theta = jnp.arccos(d)
    sin_t = jnp.sin(theta)
    near = sin_t < 1e-6
    w0 = jnp.where(near, 1.0 - t, jnp.sin((1.0 - t) * theta) / jnp.where(near, 1.0, sin_t))
    w1 = jnp.where(near, t, jnp.sin(t * theta) / jnp.where(near, 1.0, sin_t))
    return quat_normalize(w0 * q0 + w1 * q1)


def quat_average(quats, weights=None):
    """Weighted chordal-mean quaternion via the Markley eigen method.

    Replacement for the reference's ad-hoc quaternion averaging experiment
    (tests/0-quat-avg.py): largest eigenvector of Σ wᵢ qᵢ qᵢᵀ.
    """
    quats = quat_normalize(jnp.asarray(quats))
    if weights is None:
        weights = jnp.ones(quats.shape[:-1], dtype=quats.dtype)
    A = jnp.einsum("...n,...ni,...nj->...ij", weights, quats, quats)
    _, vecs = jnp.linalg.eigh(A)
    q = vecs[..., :, -1]
    return q * jnp.where(q[..., :1] < 0, -1.0, 1.0)
