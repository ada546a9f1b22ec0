import numpy as np
import jax.numpy as jnp
import pytest

from imageanalysis_tpu.core import camera as cam
from imageanalysis_tpu.core import geodesy as geo
from imageanalysis_tpu.core import rotations as rot
from imageanalysis_tpu.core import transforms as tf

cv2 = pytest.importorskip("cv2")

K = np.array([[3000.0, 0, 2000.0], [0, 3010.0, 1500.0], [0, 0, 1.0]])
DIST = np.array([-0.1, 0.02, 1e-4, -2e-4, 0.005])


def test_distort_roundtrip(rng):
    uv = rng.uniform([0, 0], [4000, 3000], size=(256, 2)).astype(np.float32)
    und = cam.undistort_pixels(jnp.asarray(uv), jnp.asarray(K), jnp.asarray(DIST))
    back = cam.redistort_pixels(und, jnp.asarray(K), jnp.asarray(DIST))
    np.testing.assert_allclose(np.asarray(back), uv, atol=2e-2)


def test_undistort_vs_cv2(rng):
    uv = rng.uniform([100, 100], [3900, 2900], size=(128, 2))
    ours = np.asarray(cam.undistort_pixels(jnp.asarray(uv, dtype=jnp.float32),
                                           jnp.asarray(K, dtype=jnp.float32),
                                           jnp.asarray(DIST, dtype=jnp.float32)))
    ref = cv2.undistortPoints(uv.reshape(-1, 1, 2).astype(np.float64), K, DIST, P=K).reshape(-1, 2)
    np.testing.assert_allclose(ours, ref, atol=0.1)  # f32 vs f64, px units


def test_project_points_vs_cv2(rng):
    # nadir-ish camera: optical axis = body-x, so pitch ≈ -90° points it down
    ned = np.array([10.0, -5.0, -100.0])
    quat = np.asarray(rot.quat_from_ypr(0.3, np.radians(-88.0), 0.08))
    pts = rng.uniform([-50, -50, -10], [50, 50, 10], size=(64, 3))
    R, t = cam.ned_quat_to_rt(jnp.asarray(ned), jnp.asarray(quat))
    rvec = np.asarray(rot.rodrigues_inv(R)).reshape(3, 1)
    tvec = np.asarray(t).reshape(3, 1)
    ref, _ = cv2.projectPoints(pts.reshape(-1, 1, 3), rvec, tvec, K, DIST)
    ours, z = cam.project_points(jnp.asarray(pts, dtype=jnp.float32), R, t,
                                 jnp.asarray(K, dtype=jnp.float32),
                                 jnp.asarray(DIST, dtype=jnp.float32))
    assert np.all(np.asarray(z) > 0)
    np.testing.assert_allclose(np.asarray(ours), ref.reshape(-1, 2), atol=0.05)


def test_pixel_vectors_ground_roundtrip():
    """Project ground point → pixel, then pixel → ray → ground intersection."""
    ned_cam = jnp.array([0.0, 0.0, -120.0])
    quat = rot.quat_from_ypr(0.2, jnp.radians(-85.0), 0.0)
    ground = 0.0
    pt = jnp.array([30.0, 18.0, -0.0])
    R, t = cam.ned_quat_to_rt(ned_cam, quat)
    uv, _ = cam.project_points(pt, R, t, jnp.asarray(K, dtype=jnp.float32),
                               jnp.zeros(5, dtype=jnp.float32))
    body2ned = rot.quat_to_matrix(quat)
    v = cam.pixel_vectors_ned(uv, body2ned, jnp.asarray(K, dtype=jnp.float32))
    hit = cam.intersect_ground_plane(ned_cam, ground, v)
    np.testing.assert_allclose(np.asarray(hit), np.asarray(pt), atol=1e-2)


def test_ned_quat_rvec_tvec_roundtrip(rng):
    ned = rng.normal(size=(8, 3)) * 50
    ypr = rng.uniform(-0.8, 0.8, size=(8, 3))
    quat = rot.quat_from_ypr(ypr[:, 0], ypr[:, 1], ypr[:, 2])
    rvec, tvec = cam.ned_quat_to_rvec_tvec(jnp.asarray(ned), quat)
    ned2, quat2 = cam.rvec_tvec_to_ned_quat(rvec, tvec)
    np.testing.assert_allclose(np.asarray(ned2), ned, atol=1e-3)
    dots = np.abs(np.sum(np.asarray(quat2) * np.asarray(quat), axis=-1))
    np.testing.assert_allclose(dots, 1.0, atol=1e-5)


# ---------------------------------------------------------------------------


def test_lla_ecef_roundtrip(rng):
    lat = rng.uniform(-80, 80, 16)
    lon = rng.uniform(-180, 180, 16)
    alt = rng.uniform(-100, 4000, 16)
    ecef = geo.lla2ecef(lat, lon, alt)
    lla = geo.ecef2lla(ecef)
    np.testing.assert_allclose(lla[:, 0], lat, atol=1e-9)
    np.testing.assert_allclose(lla[:, 1], lon, atol=1e-9)
    np.testing.assert_allclose(lla[:, 2], alt, atol=1e-5)


def test_lla_ned_roundtrip():
    ref = (44.97, -93.26, 280.0)
    ned = np.array([[120.0, -340.0, -80.0], [0, 0, 0], [-1500.0, 900.0, 30.0]])
    lla = geo.ned2lla(ned, *ref)
    back = geo.lla2ned(lla[:, 0], lla[:, 1], lla[:, 2], *ref)
    np.testing.assert_allclose(back, ned, atol=1e-6)


def test_navpy_parity_if_available():
    navpy = pytest.importorskip("navpy")
    ref = (44.97, -93.26, 280.0)
    ned = geo.lla2ned(44.975, -93.27, 350.0, *ref)
    ref_ned = navpy.lla2ned(44.975, -93.27, 350.0, *ref)
    np.testing.assert_allclose(ned, ref_ned, atol=1e-6)


def test_jnp_tangent_plane_close_to_exact():
    ref = (44.97, -93.26, 280.0)
    lat, lon, alt = 44.976, -93.252, 350.0
    exact = geo.lla2ned(lat, lon, alt, *ref)
    approx = np.asarray(geo.lla2ned_j(lat, lon, alt, *ref))
    np.testing.assert_allclose(approx, exact, atol=0.15)
    lla = np.asarray(geo.ned2lla_j(jnp.asarray(exact, dtype=jnp.float64), *ref))
    np.testing.assert_allclose(lla[:2], [lat, lon], atol=2e-6)  # ≈20 cm
    np.testing.assert_allclose(lla[2], alt, atol=0.15)


# ---------------------------------------------------------------------------


def test_umeyama_recovers_similarity(rng):
    src = rng.normal(size=(40, 3))
    R_true = np.asarray(rot.quat_to_matrix(rot.quat_from_ypr(0.4, -0.2, 0.1)))
    s_true, t_true = 1.7, np.array([3.0, -2.0, 5.0])
    dst = s_true * src @ R_true.T + t_true
    s, R, t = tf.umeyama(jnp.asarray(src), jnp.asarray(dst))
    np.testing.assert_allclose(float(s), s_true, atol=1e-4)
    np.testing.assert_allclose(np.asarray(R), R_true, atol=1e-4)
    np.testing.assert_allclose(np.asarray(t), t_true, atol=1e-3)
    out = tf.apply_similarity(s, R, t, jnp.asarray(src))
    np.testing.assert_allclose(np.asarray(out), dst, atol=1e-3)


def test_fit_similarity_2d_vs_cv2(rng):
    src = rng.normal(size=(30, 2)).astype(np.float32) * 100
    theta, s, t = 0.3, 1.2, np.array([5.0, -3.0])
    Rm = s * np.array([[np.cos(theta), -np.sin(theta)], [np.sin(theta), np.cos(theta)]])
    dst = (src @ Rm.T + t).astype(np.float32)
    A = np.asarray(tf.fit_similarity_2d(jnp.asarray(src), jnp.asarray(dst)))
    A_cv, _ = cv2.estimateAffinePartial2D(src, dst)
    np.testing.assert_allclose(A, A_cv, atol=1e-3)
    r, tx, ty, sx, sy = tf.decompose_affine_2d(jnp.asarray(A))
    np.testing.assert_allclose(float(r), theta, atol=1e-4)
    np.testing.assert_allclose(float(sx), s, atol=1e-4)
