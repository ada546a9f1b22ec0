"""5-point essential solver: minimal solve, RANSAC, planar degeneracy.

The reference relies on cv2.findEssentialMat (Nistér 5-point) inside its
match filtering (reference matcher.py:126). These tests check our
Stewénius action-matrix implementation recovers exact minimal solutions,
survives outliers in RANSAC, and — the key motivation — handles planar
scenes where the 8-point algorithm degenerates.
"""

import numpy as np
import pytest

from imageanalysis_tpu.ops import essential5


def _make_scene(n, planar=False, seed=0, noise=0.0):
    rng = np.random.default_rng(seed)
    # camera 1 at origin; camera 2 translated + rotated
    t = np.array([1.0, 0.15, -0.1])
    aa = np.array([0.05, -0.3, 0.08])

    def rodrigues(w):
        th = np.linalg.norm(w)
        k = w / th
        Kx = np.array([[0, -k[2], k[1]], [k[2], 0, -k[0]], [-k[1], k[0], 0]])
        return np.eye(3) + np.sin(th) * Kx + (1 - np.cos(th)) * Kx @ Kx

    R = rodrigues(aa)
    if planar:
        pts = np.c_[rng.uniform(-2, 2, (n, 2)), np.full(n, 6.0)]
    else:
        pts = np.c_[rng.uniform(-2, 2, (n, 2)), rng.uniform(4, 10, n)]
    q1 = pts[:, :2] / pts[:, 2:3]
    p2 = pts @ R.T + t
    q2 = p2[:, :2] / p2[:, 2:3]
    if noise:
        q1 = q1 + rng.normal(0, noise, q1.shape)
        q2 = q2 + rng.normal(0, noise, q2.shape)
    Tx = np.array([[0, -t[2], t[1]], [t[2], 0, -t[0]], [-t[1], t[0], 0]])
    E_true = Tx @ R
    E_true /= np.linalg.norm(E_true)
    return q1, q2, E_true, R, t


def _e_dist(E1, E2):
    E1 = E1 / np.linalg.norm(E1)
    E2 = E2 / np.linalg.norm(E2)
    return min(np.abs(E1 - E2).max(), np.abs(E1 + E2).max())


def test_minimal_5pt_exact():
    q1, q2, E_true, _, _ = _make_scene(5, seed=1)
    E, valid = essential5.solve_5pt(q1[None], q2[None])
    E, valid = E[0], valid[0]
    assert valid.any()
    dists = [_e_dist(E[k], E_true) for k in range(10) if valid[k]]
    assert min(dists) < 1e-6, f"best E distance {min(dists)}"


def test_minimal_5pt_batched():
    """Batched solve returns a correct solution for every problem."""
    q1s, q2s, Es = [], [], []
    for s in range(6):
        q1, q2, E_true, _, _ = _make_scene(5, seed=10 + s)
        q1s.append(q1)
        q2s.append(q2)
        Es.append(E_true)
    E, valid = essential5.solve_5pt(np.stack(q1s), np.stack(q2s))
    for b in range(6):
        dists = [_e_dist(E[b, k], Es[b]) for k in range(10) if valid[b, k]]
        assert min(dists) < 1e-5, f"problem {b}: {min(dists)}"


def test_ransac_with_outliers():
    q1, q2, E_true, _, _ = _make_scene(200, seed=2, noise=1e-4)
    rng = np.random.default_rng(3)
    bad = rng.choice(200, 60, replace=False)
    q2c = q2.copy()
    q2c[bad] += rng.uniform(-0.3, 0.3, (60, 2))
    E, inl, n = essential5.ransac_essential_5pt(q1, q2c, thresh=1e-5,
                                                n_hyp=128, seed=0)
    assert n > 120
    assert inl[bad].sum() < 5
    assert _e_dist(E, E_true) < 1e-2


def test_planar_scene_5pt_succeeds_8pt_fails():
    """On a planar scene the 8-point essential degenerates (the planar
    homography induces a 2-parameter family of F); 5-point remains exact.
    This is the aerial common case and the reason the reference uses
    Nistér inside cv2 (matcher.py:126)."""
    import jax
    import jax.numpy as jnp

    from imageanalysis_tpu.ops import ransac

    q1, q2, E_true, _, _ = _make_scene(100, planar=True, seed=4, noise=1e-5)
    E5, inl5, n5 = essential5.ransac_essential_5pt(q1, q2, thresh=1e-5,
                                                   n_hyp=128, seed=0)
    assert n5 > 80
    err5 = _e_dist(E5, E_true)
    assert err5 < 5e-2, f"5-point failed on planar scene: {err5}"

    # 8-point on the same data (pixel coords with identity K)
    K = jnp.eye(3, dtype=jnp.float32)
    res = ransac.ransac_essential(jax.random.PRNGKey(0),
                                  jnp.asarray(q1, jnp.float32),
                                  jnp.asarray(q2, jnp.float32),
                                  jnp.ones(len(q1), bool), K,
                                  thresh=0.01, n_hyp=128)
    E8 = np.array(res[0], np.float64)
    err8 = _e_dist(E8, E_true)
    assert err8 > 2 * err5, (
        f"expected 8-point to degenerate on planar scene: 8pt={err8:.4f} "
        f"5pt={err5:.4f}")


def test_decompose_essential():
    q1, q2, E_true, R_true, t_true = _make_scene(50, seed=5)
    R, t = essential5.decompose_essential(E_true, q1, q2)
    assert np.allclose(R, R_true, atol=1e-6)
    t_unit = t_true / np.linalg.norm(t_true)
    assert np.allclose(t, t_unit, atol=1e-6)


def test_matcher_essential5_e2e(tmp_path):
    """--filter essential5 drives the host 5-point refilter through the
    real matcher on a small synthetic mission."""
    import os

    from imageanalysis_tpu.apps import process
    from imageanalysis_tpu.io import camera_db
    from imageanalysis_tpu.testing.synthetic import SyntheticMission

    proj_dir = str(tmp_path / "m")
    m = SyntheticMission(proj_dir, n_images=3, img_size=(640, 480),
                         altitude=90.0, spacing=12.0, seed=7)
    m.generate()
    db = str(tmp_path / "cams")
    camera_db.save("Synthetic_TestCam_none", m.camera_config(), db)
    rc = process.main([proj_dir, "--camera", "Synthetic_TestCam_none",
                       "--camera-db", db, "--scale", "1.0", "--ground", "0.0",
                       "--batch-size", "2", "--min-chain-len", "2",
                       "--filter", "essential5"])
    assert rc == 0
    assert os.path.isfile(os.path.join(proj_dir, "ImageAnalysis",
                                       "matches_grouped"))
