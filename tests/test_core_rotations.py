import numpy as np
import jax
import jax.numpy as jnp
import pytest

from imageanalysis_tpu.core import rotations as rot

cv2 = pytest.importorskip("cv2")


def random_quats(rng, n):
    q = rng.normal(size=(n, 4))
    return q / np.linalg.norm(q, axis=-1, keepdims=True)


def test_quat_multiply_identity(rng):
    q = random_quats(rng, 8)
    ident = np.array([1.0, 0, 0, 0])
    np.testing.assert_allclose(rot.quat_multiply(q, ident), q, atol=1e-6)
    np.testing.assert_allclose(rot.quat_multiply(ident, q), q, atol=1e-6)


def test_quat_inverse(rng):
    q = random_quats(rng, 8)
    prod = rot.quat_multiply(q, rot.quat_inverse(jnp.asarray(q)))
    expect = np.tile([1.0, 0, 0, 0], (8, 1))
    np.testing.assert_allclose(prod, expect, atol=1e-5)


def test_ypr_quat_roundtrip(rng):
    ypr = rng.uniform(-1.2, 1.2, size=(32, 3))
    q = rot.quat_from_ypr(ypr[:, 0], ypr[:, 1], ypr[:, 2])
    y, p, r = rot.ypr_from_quat(q)
    np.testing.assert_allclose(np.stack([y, p, r], -1), ypr, atol=1e-5)


def test_quat_matrix_vs_composition(rng):
    """quat_to_matrix(quat_from_ypr) == Rz(yaw)Ry(pitch)Rx(roll) (body→NED DCM)."""
    for yaw, pitch, roll in rng.uniform(-1.0, 1.0, size=(8, 3)):
        q = rot.quat_from_ypr(yaw, pitch, roll)
        M = np.asarray(rot.quat_to_matrix(q))
        cz, sz = np.cos(yaw), np.sin(yaw)
        cy, sy = np.cos(pitch), np.sin(pitch)
        cx, sx = np.cos(roll), np.sin(roll)
        Rz = np.array([[cz, -sz, 0], [sz, cz, 0], [0, 0, 1]])
        Ry = np.array([[cy, 0, sy], [0, 1, 0], [-sy, 0, cy]])
        Rx = np.array([[1, 0, 0], [0, cx, -sx], [0, sx, cx]])
        np.testing.assert_allclose(M, Rz @ Ry @ Rx, atol=1e-6)


def test_matrix_quat_roundtrip(rng):
    q = random_quats(rng, 64)
    q *= np.where(q[:, :1] < 0, -1.0, 1.0)  # canonical sign
    M = rot.quat_to_matrix(jnp.asarray(q))
    q2 = rot.matrix_to_quat(M)
    np.testing.assert_allclose(np.asarray(q2), q, atol=1e-5)


def test_rodrigues_vs_cv2(rng):
    rvecs = rng.normal(size=(16, 3))
    rvecs = np.vstack([rvecs, [[0, 0, 0]], [[1e-9, 0, 0]], [[np.pi, 0, 0]]])
    ours = np.asarray(rot.rodrigues(jnp.asarray(rvecs)))
    for i, rv in enumerate(rvecs):
        Rcv, _ = cv2.Rodrigues(rv.reshape(3, 1))
        np.testing.assert_allclose(ours[i], Rcv, atol=1e-5)


def test_rodrigues_inv_roundtrip(rng):
    rvecs = rng.normal(size=(16, 3))
    R = rot.rodrigues(jnp.asarray(rvecs))
    rv2 = rot.rodrigues_inv(R)
    np.testing.assert_allclose(np.asarray(rv2), rvecs, atol=1e-4)


def test_rodrigues_differentiable():
    g = jax.grad(lambda r: jnp.sum(rot.rodrigues(r)))(jnp.zeros(3))
    assert np.all(np.isfinite(np.asarray(g)))


def test_rotation_matrix_axis():
    M = np.asarray(rot.rotation_matrix(np.pi / 2, [0, 0, 1]))
    np.testing.assert_allclose(M @ np.array([1.0, 0, 0]), [0, 1, 0], atol=1e-6)


def test_quat_average(rng):
    base = rot.quat_from_ypr(0.3, 0.1, -0.2)
    noisy = []
    for _ in range(50):
        d = rng.normal(scale=0.01, size=3)
        noisy.append(rot.quat_multiply(base, rot.quat_from_ypr(*d)))
    avg = rot.quat_average(jnp.stack(noisy))
    dot = abs(float(jnp.sum(avg * base)))
    assert dot > 0.99999


def test_slerp_endpoints(rng):
    q0, q1 = random_quats(rng, 2)
    np.testing.assert_allclose(rot.quat_slerp(q0, q1, 0.0), q0 / np.linalg.norm(q0), atol=1e-5)
    np.testing.assert_allclose(np.abs(rot.quat_slerp(q0, q1, 1.0)), np.abs(q1), atol=1e-5)
