"""Device CLAHE (ops/clahe.py): cv2 parity and the detect-path wiring.

Reference anchor: image.py:99-135 (cv2.createCLAHE(3.0, (8,8)) before
detection)."""

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from imageanalysis_tpu.ops.clahe import clahe  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(7)


def _cv(img):
    return cv2.createCLAHE(clipLimit=3.0, tileGridSize=(8, 8)).apply(img)


def test_clahe_matches_cv2_divisible(rng):
    """Grid-divisible dims: tile-center geometry matches cv2 exactly;
    only LUT rounding may differ (≤1 gray level)."""
    img = rng.integers(0, 255, (512, 768), np.uint8)
    d = np.abs(_cv(img).astype(int) - np.asarray(clahe(img)).astype(int))
    assert d.max() <= 1
    assert d.mean() < 0.05


def test_clahe_matches_cv2_smooth(rng):
    img = cv2.GaussianBlur(
        rng.integers(0, 255, (720, 1088)).astype(np.float32),
        (0, 0), 4.0).astype(np.uint8)
    d = np.abs(_cv(img).astype(int) - np.asarray(clahe(img)).astype(int))
    assert d.max() <= 1


def test_clahe_odd_dims_close(rng):
    """Non-divisible dims pad with edge values where cv2 ceil-sizes its
    border tiles — sub-pixel geometry difference confined to the border
    band; require close, not exact."""
    img = rng.integers(0, 200, (363, 517), np.uint8)
    d = np.abs(_cv(img).astype(int) - np.asarray(clahe(img)).astype(int))
    assert d.mean() < 0.5
    assert np.mean(d > 2) < 0.02


def test_clahe_batch_matches_single(rng):
    imgs = rng.integers(0, 255, (3, 256, 320), np.uint8)
    got = np.asarray(clahe(imgs))
    for b in range(3):
        np.testing.assert_array_equal(got[b], np.asarray(clahe(imgs[b])))
    assert got.dtype == np.uint8


def test_detect_dispatch_device_clahe_equals_host(rng):
    """detect_dispatch(equalize=True) must equal host-CLAHE + dispatch
    up to CLAHE's ±1-level rounding — same keypoints within a pixel on a
    textured synthetic image."""
    from imageanalysis_tpu.features import sift_tpu

    img = cv2.GaussianBlur(
        rng.integers(0, 255, (256, 320)).astype(np.float32),
        (0, 0), 2.0)
    img = cv2.normalize(img, None, 30, 220, cv2.NORM_MINMAX).astype(np.uint8)

    dev = sift_tpu.detect_finalize(
        sift_tpu.detect_dispatch(img, 512, equalize=True))
    host = sift_tpu.detect_finalize(
        sift_tpu.detect_dispatch(_cv(img), 512, equalize=False))
    kp_d, _, _ = dev
    kp_h, _, _ = host
    assert len(kp_d) > 50
    # match counts and keypoint sets agree closely (±1-level input noise
    # can flip a handful of marginal extrema)
    assert abs(len(kp_d) - len(kp_h)) <= 0.05 * max(len(kp_d), len(kp_h))
    from scipy.spatial import cKDTree
    dist, _ = cKDTree(kp_h).query(kp_d, k=1)
    assert np.median(dist) < 0.5
