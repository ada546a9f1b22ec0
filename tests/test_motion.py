import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from imageanalysis_tpu.motion import flow, segment, streaming_dmd


def test_exact_dmd_recovers_dynamics(rng):
    """Planted linear system: two oscillating modes + static mode."""
    n, T = 200, 40
    # static mode + a proper conjugate pair (complex mode ⇒ the real signal
    # spans the full 2-D rotation plane, making the dynamics truly linear)
    phi0 = rng.normal(size=n)
    phic = rng.normal(size=n) + 1j * rng.normal(size=n)
    lam = np.array([1.0, np.exp(1j * 0.5), np.exp(-1j * 0.5)])
    phi = np.column_stack([phi0, phic, np.conj(phic)])
    t = np.arange(T)
    X = np.real(phi @ (lam[:, None] ** t[None, :] * np.array([5, 2, 2])[:, None]))
    modes, evals, amps = segment.exact_dmd(X[:, :-1], X[:, 1:], rank=5)
    # eigenvalues recovered
    got = sorted(np.round(evals, 3), key=lambda z: (abs(z.imag), z.real))
    assert any(abs(e - 1.0) < 0.02 for e in evals)
    assert any(abs(e - np.exp(1j * 0.5)) < 0.05 for e in evals)


def test_background_model_finds_mover(rng):
    """Static textured background + a small moving blob."""
    T, H, W = 30, 60, 80
    bg = cv2.GaussianBlur(rng.uniform(50, 200, (H, W)).astype(np.float32),
                          (0, 0), 2)
    frames = np.tile(bg, (T, 1, 1))
    for t in range(T):
        x = 10 + t * 2
        frames[t, 28:34, x:x + 6] = 255.0
    est_bg, residuals = segment.background_model(frames, rank=8)
    # background recovered away from the mover track
    np.testing.assert_allclose(est_bg[:20], bg[:20], atol=10)
    # mover pixels have big residuals at their frame
    assert residuals[10, 30, 30:36].mean() > 5 * residuals[10, 5, 5]


def test_streaming_dmd_matches_exact(rng):
    n, T = 100, 25
    phi0 = rng.normal(size=n)
    phic = rng.normal(size=n) + 1j * rng.normal(size=n)
    phi = np.column_stack([phi0, phic, np.conj(phic)])
    lam = np.array([0.98, np.exp(1j * 0.3), np.exp(-1j * 0.3)])
    t = np.arange(T)
    X = np.real(phi @ (lam[:, None] ** t[None, :]))
    sdmd = streaming_dmd.StreamingDMD(max_rank=6)
    for k in range(T - 1):
        sdmd.update(X[:, k], X[:, k + 1])
    modes, evals = sdmd.compute_modes()
    assert any(abs(e - 0.98) < 0.05 for e in evals)
    assert any(abs(e - np.exp(1j * 0.3)) < 0.05 for e in evals)


def test_sparse_lk_homography(rng):
    base = cv2.GaussianBlur(rng.uniform(0, 255, (300, 400)).astype(np.float32),
                            (0, 0), 2)
    base = cv2.normalize(base, None, 0, 255, cv2.NORM_MINMAX).astype(np.uint8)
    H_true = np.array([[1.0, 0.0, 6.0], [0.0, 1.0, -4.0], [0, 0, 1.0]])
    warped = cv2.warpPerspective(base, H_true, (400, 300))
    tracker = flow.SparseLK()
    H0, _ = tracker.update(base)
    assert H0 is None
    H1, n_inl = tracker.update(warped)
    assert H1 is not None and n_inl > 50
    np.testing.assert_allclose(H1[:2, 2], [6.0, -4.0], atol=0.5)
    K = np.array([[400.0, 0, 200], [0, 400.0, 150], [0, 0, 1]])
    R, t, nrm = flow.decompose_homography(H1, K)
    assert abs(np.trace(R) - 3.0) < 0.05  # nearly pure translation


def test_lens_distortion_recovery(rng):
    """Planted k1 recovered from synthetic distorted flow tracks."""
    import jax.numpy as jnp

    from imageanalysis_tpu.core.camera import distort_normalized, \
        normalized_to_pixels, pixels_to_normalized
    from imageanalysis_tpu.motion import lens_distortion

    K = np.array([[600.0, 0, 480], [0, 600.0, 360], [0, 0, 1]], np.float32)
    k1_true = -0.22
    dist = jnp.array([k1_true, 0.0, 0.0, 0.0, 0.0])
    pairs = []
    for _ in range(12):
        # ideal points + a random similarity motion, then distort both views
        pa_ideal = rng.uniform([-0.6, -0.45], [0.6, 0.45], (120, 2)).astype(
            np.float32)
        th = rng.normal(0, 0.05)
        t = rng.normal(0, 0.05, 2)
        R = np.array([[np.cos(th), -np.sin(th)], [np.sin(th), np.cos(th)]])
        pb_ideal = (pa_ideal @ R.T + t).astype(np.float32)
        pa = normalized_to_pixels(distort_normalized(jnp.asarray(pa_ideal),
                                                     dist), jnp.asarray(K))
        pb = normalized_to_pixels(distort_normalized(jnp.asarray(pb_ideal),
                                                     dist), jnp.asarray(K))
        pairs.append((np.asarray(pa), np.asarray(pb)))
    k1, k2, hist = lens_distortion.estimate_k1_k2(pairs, K, iters=250)
    assert hist[-1] < hist[0] / 10
    assert abs(k1 - k1_true) < 0.05, (k1, k2)
