import numpy as np
import jax
import jax.numpy as jnp
import pytest

from imageanalysis_tpu.ops import ransac, triangulate
from imageanalysis_tpu.core import rotations as rot
from imageanalysis_tpu.core import camera as cam

cv2 = pytest.importorskip("cv2")

KEY = jax.random.PRNGKey(0)
K = np.array([[2000.0, 0, 1000.0], [0, 2000.0, 750.0], [0, 0, 1.0]])


def planted_homography(rng, n=200, n_out=60, noise=0.5):
    H = np.array([[1.1, 0.05, 30.0], [-0.04, 0.95, -20.0], [1e-5, -2e-5, 1.0]])
    pa = rng.uniform([0, 0], [2000, 1500], size=(n, 2))
    ph = np.c_[pa, np.ones(n)] @ H.T
    pb = ph[:, :2] / ph[:, 2:3] + rng.normal(0, noise, (n, 2))
    out_idx = rng.choice(n, n_out, replace=False)
    pb[out_idx] += rng.uniform(80, 400, (n_out, 2)) * rng.choice([-1, 1], (n_out, 2))
    inlier_true = np.ones(n, bool)
    inlier_true[out_idx] = False
    return H, pa.astype(np.float32), pb.astype(np.float32), inlier_true


def test_ransac_homography_recovers(rng):
    H, pa, pb, inl_true = planted_homography(rng)
    res = ransac.ransac_homography(KEY, jnp.asarray(pa), jnp.asarray(pb),
                                   jnp.ones(len(pa), bool), thresh=3.0)
    assert bool(res.ok)
    inl = np.asarray(res.inliers)
    # finds essentially all true inliers, almost no outliers
    assert (inl & inl_true).sum() >= 0.97 * inl_true.sum()
    assert (inl & ~inl_true).sum() <= 3
    Hn = np.asarray(res.model)
    np.testing.assert_allclose(Hn / Hn[2, 2], H / H[2, 2], rtol=2e-2, atol=2e-2)


def test_homography_4pt_batched_matches_normal_equations(rng):
    """The scalar-lane projective-basis minimal solver must agree (up to
    scale) with the 8×8 normal-equation solver it replaced."""
    pa = rng.uniform(-1.5, 1.5, (64, 4, 2)).astype(np.float32)
    H_true = np.array([[1.2, 0.1, 0.3], [-0.05, 0.9, -0.2], [0.02, -0.03, 1.0]],
                      np.float32)
    ph = np.concatenate([pa, np.ones((64, 4, 1), np.float32)], -1) @ H_true.T
    pb = (ph[..., :2] / ph[..., 2:3]).astype(np.float32)
    Hb = np.asarray(ransac._homography_4pt_batched(jnp.asarray(pa),
                                                   jnp.asarray(pb)))
    Ho = np.asarray(jax.vmap(lambda a, b: ransac._homography_4pt(a, b))(
        jnp.asarray(pa), jnp.asarray(pb)))
    for i in range(64):
        a = Hb[i] / Hb[i, 2, 2]
        b = Ho[i] / Ho[i, 2, 2]
        # closed form is tight; the old f32 normal-equation solve squares
        # the condition number and is only good to ~1e-2
        np.testing.assert_allclose(a, H_true / H_true[2, 2], rtol=2e-3,
                                   atol=2e-3)
        np.testing.assert_allclose(b, H_true / H_true[2, 2], rtol=5e-2,
                                   atol=5e-2)


def test_ransac_homography_padded_invalid(rng):
    H, pa, pb, _ = planted_homography(rng, n=100, n_out=20)
    pad = np.zeros((28, 2), np.float32)
    pa_p = np.vstack([pa, pad])
    pb_p = np.vstack([pb, pad])
    valid = np.r_[np.ones(100, bool), np.zeros(28, bool)]
    res = ransac.ransac_homography(KEY, jnp.asarray(pa_p), jnp.asarray(pb_p),
                                   jnp.asarray(valid), thresh=3.0)
    inl = np.asarray(res.inliers)
    assert not inl[100:].any()
    assert inl.sum() >= 70


def two_view_scene(rng, n=300, n_out=0, noise=0.3, zspan=(-5, 5)):
    """Synthetic two-camera rig viewing ground points."""
    pts = rng.uniform([-60, -60, zspan[0]], [60, 60, zspan[1]], size=(n, 3))
    ned1 = np.array([0.0, 0.0, -120.0])
    ned2 = np.array([25.0, 10.0, -118.0])
    q1 = rot.quat_from_ypr(0.1, np.radians(-88), 0.02)
    q2 = rot.quat_from_ypr(0.15, np.radians(-87), -0.03)
    R1, t1 = cam.ned_quat_to_rt(jnp.asarray(ned1), q1)
    R2, t2 = cam.ned_quat_to_rt(jnp.asarray(ned2), q2)
    Kj = jnp.asarray(K, dtype=jnp.float32)
    uv1, _ = cam.project_points(jnp.asarray(pts, dtype=jnp.float32), R1, t1, Kj, jnp.zeros(5))
    uv2, _ = cam.project_points(jnp.asarray(pts, dtype=jnp.float32), R2, t2, Kj, jnp.zeros(5))
    uv1 = np.asarray(uv1) + rng.normal(0, noise, (n, 2))
    uv2 = np.asarray(uv2) + rng.normal(0, noise, (n, 2))
    inlier_true = np.ones(n, bool)
    if n_out:
        out_idx = rng.choice(n, n_out, replace=False)
        uv2[out_idx] += rng.uniform(60, 300, (n_out, 2)) * rng.choice([-1, 1], (n_out, 2))
        inlier_true[out_idx] = False
    return pts, (R1, t1), (R2, t2), uv1.astype(np.float32), uv2.astype(np.float32), inlier_true


def test_ransac_fundamental(rng):
    pts, _, _, uv1, uv2, inl_true = two_view_scene(rng, n=300, n_out=80)
    res = ransac.ransac_fundamental(KEY, jnp.asarray(uv1), jnp.asarray(uv2),
                                    jnp.ones(len(uv1), bool), thresh=2.0)
    assert bool(res.ok)
    inl = np.asarray(res.inliers)
    assert (inl & inl_true).sum() >= 0.9 * inl_true.sum()
    assert (inl & ~inl_true).sum() <= 5


def test_ransac_essential(rng):
    # essential needs a non-planar scene (8-point planar degeneracy — see
    # ransac_essential docstring); give the terrain real depth variation
    pts, _, _, uv1, uv2, inl_true = two_view_scene(rng, n=300, n_out=80, zspan=(-40, 10))
    res = ransac.ransac_essential(KEY, jnp.asarray(uv1), jnp.asarray(uv2),
                                  jnp.ones(len(uv1), bool), jnp.asarray(K, dtype=jnp.float32),
                                  thresh=2.0)
    assert bool(res.ok)
    inl = np.asarray(res.inliers)
    assert (inl & inl_true).sum() >= 0.9 * inl_true.sum()
    assert (inl & ~inl_true).sum() <= 5


def test_ransac_similarity(rng):
    n = 150
    pa = rng.uniform(-100, 100, (n, 2)).astype(np.float32)
    th, s, t = 0.4, 1.3, np.array([10.0, -5.0])
    Rm = s * np.array([[np.cos(th), -np.sin(th)], [np.sin(th), np.cos(th)]])
    pb = (pa @ Rm.T + t).astype(np.float32)
    pb[:30] += rng.uniform(50, 200, (30, 2)).astype(np.float32)
    res = ransac.ransac_similarity_2d(KEY, jnp.asarray(pa), jnp.asarray(pb),
                                      jnp.ones(n, bool), thresh=2.0)
    inl = np.asarray(res.inliers)
    assert inl[30:].sum() >= 115 and inl[:30].sum() <= 2


def test_triangulate_two_view_vs_cv2(rng):
    pts, (R1, t1), (R2, t2), uv1, uv2, _ = two_view_scene(rng, n=100, noise=0.0)
    Kj = jnp.asarray(K, dtype=jnp.float32)
    P1 = triangulate.projection_matrix(R1, t1, Kj)
    P2 = triangulate.projection_matrix(R2, t2, Kj)
    ours = np.asarray(triangulate.triangulate_two_view(P1, P2, jnp.asarray(uv1), jnp.asarray(uv2)))
    np.testing.assert_allclose(ours, pts, atol=0.1)
    ref4 = cv2.triangulatePoints(np.asarray(P1), np.asarray(P2), uv1.T, uv2.T)
    ref = (ref4[:3] / ref4[3]).T
    np.testing.assert_allclose(ours, ref, atol=0.1)


def test_triangulate_rays(rng):
    p_true = np.array([10.0, -20.0, 35.0])
    n = 12
    origins = rng.normal(0, 50, (n, 3))
    dirs = p_true - origins
    dirs += rng.normal(0, 0.001, (n, 3))
    mask = np.ones(n, bool)
    mask[-3:] = False
    origins[-3:] = 1e6  # garbage that must be ignored
    p = np.asarray(triangulate.triangulate_rays(jnp.asarray(origins), jnp.asarray(dirs),
                                                jnp.asarray(mask)))
    np.testing.assert_allclose(p, p_true, atol=0.2)
