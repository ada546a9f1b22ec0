"""Feature/descriptor cache formats and the fast scaled image loader.

The detect stage is host-bound at mission scale (BENCH_mission_2812:
0.254 s/img wall vs 0.096 s device): the v2 array .feat format, raw-npy
.desc, draft JPEG decode, and scaled CLAHE each cut a measured slice of
the per-image host cost (scripts_dev/profile_detect_host.py). These tests
pin round-trips and cross-format compatibility (reference image.py:140-228
formats must stay readable)."""

import gzip
import os
import pickle

import numpy as np
import pytest

from imageanalysis_tpu.features.detect import load_gray, load_scaled_gray
from imageanalysis_tpu.io.project import ImageRecord


@pytest.fixture
def rec(tmp_path):
    meta = tmp_path / "meta"
    cache = tmp_path / "cache"
    meta.mkdir()
    cache.mkdir()
    r = ImageRecord(str(tmp_path), "img1")
    return r


def test_feat_v2_roundtrip(rec, rng):
    rec.kp = rng.uniform(0, 4000, (37, 2)).astype(np.float32)
    rec.kp_meta = rng.uniform(0, 10, (37, 4)).astype(np.float32)
    rec.save_features()
    kp0, meta0 = rec.kp, rec.kp_meta
    rec.kp = rec.kp_meta = None
    assert rec.load_features()
    np.testing.assert_array_equal(rec.kp, kp0)
    np.testing.assert_array_equal(rec.kp_meta, meta0)


def test_feat_legacy_write_and_reference_read(rec, rng, monkeypatch):
    """IMAGEANALYSIS_TPU_LEGACY_FEAT writes the reference's tuple pickle
    (image.py:192-208) and load_features reads it back."""
    monkeypatch.setenv("IMAGEANALYSIS_TPU_LEGACY_FEAT", "1")
    rec.kp = rng.uniform(0, 4000, (11, 2)).astype(np.float32)
    rec.kp_meta = rng.uniform(0, 10, (11, 4)).astype(np.float32)
    rec.save_features()
    with gzip.open(rec.features_file, "rb") as f:
        raw = pickle.load(f)
    assert isinstance(raw, list) and len(raw) == 11
    assert len(raw[0]) == 6 and len(raw[0][0]) == 2   # ((u,v),s,a,r,o,cid)
    kp0 = rec.kp.copy()
    rec.kp = None
    assert rec.load_features()
    np.testing.assert_allclose(rec.kp, kp0, rtol=1e-6)


def test_feat_reads_reference_format(rec):
    """A file written by the reference itself (list of tuples) loads."""
    feats = [((float(i), float(2 * i)), 1.5, 30.0, 0.01, 2, -1)
             for i in range(5)]
    with gzip.open(rec.features_file, "wb") as f:
        pickle.dump(feats, f)
    assert rec.load_features()
    assert rec.kp.shape == (5, 2)
    np.testing.assert_allclose(rec.kp[:, 1], 2 * rec.kp[:, 0])
    np.testing.assert_allclose(rec.kp_meta[0], [1.5, 30.0, 0.01, 2])


def test_desc_raw_npy_roundtrip_uint8(rec, rng):
    rec.des = rng.integers(0, 256, (64, 128)).astype(np.float32)
    rec.save_descriptors()
    with open(rec.desc_file, "rb") as f:
        assert f.read(6) == b"\x93NUMPY"      # raw npy, not gzip
    des0 = rec.des.copy()
    rec.des = None
    assert rec.load_descriptors()
    assert rec.des.dtype == np.float32
    np.testing.assert_array_equal(rec.des, des0)


def test_desc_gzip_fallback_read(rec, rng):
    """gzip-wrapped .desc (reference format / older caches) still loads."""
    des = rng.normal(0, 1, (16, 128)).astype(np.float32)   # non-integral
    rec.des = des
    rec.save_descriptors()                                  # gzip path
    with open(rec.desc_file, "rb") as f:
        assert f.read(2) == b"\x1f\x8b"
    rec.des = None
    assert rec.load_descriptors()
    np.testing.assert_array_equal(rec.des, des)


def _write_test_jpeg(path, w=640, h=480):
    import cv2

    yy, xx = np.mgrid[0:h, 0:w]
    img = (127 + 60 * np.sin(xx / 37.0) * np.cos(yy / 23.0)).astype(np.uint8)
    cv2.imwrite(path, img, [cv2.IMWRITE_JPEG_QUALITY, 95])
    return img


def test_load_scaled_gray_draft_matches_full_decode(tmp_path):
    """Draft-mode decode + resize + CLAHE stays close to the full-decode
    path (resize-then-CLAHE on both sides; draft is a DCT-domain 1/2
    decode, so pixel values differ only by resampling)."""
    import cv2

    path = str(tmp_path / "t.jpg")
    _write_test_jpeg(path)
    scaled, full = load_scaled_gray(path, 0.4, equalize=True)
    assert full == (640, 480)
    assert scaled.shape == (192, 256)
    gray = load_gray(path, equalize=False)
    ref = cv2.resize(gray, (0, 0), fx=0.4, fy=0.4)
    clahe = cv2.createCLAHE(clipLimit=3.0, tileGridSize=(8, 8))
    ref = clahe.apply(ref)
    assert ref.shape == scaled.shape
    # resampling-path difference only: tight mean, loose max
    assert np.mean(np.abs(scaled.astype(float) - ref.astype(float))) < 6.0


def test_load_scaled_gray_scale_one_and_png(tmp_path):
    import cv2

    path = str(tmp_path / "t.png")
    img = _write_test_jpeg(str(tmp_path / "src.jpg"))
    cv2.imwrite(path, img)
    scaled, full = load_scaled_gray(path, 1.0, equalize=False)
    assert full == (640, 480) and scaled.shape == (480, 640)
    np.testing.assert_array_equal(scaled, img)
    half, full2 = load_scaled_gray(path, 0.5, equalize=False)
    assert full2 == (640, 480) and half.shape == (240, 320)
