"""Transport codec (features/transport.py): exact round-trip, adaptive
fallback, and end-to-end parity of the codec detect path vs raw upload.

The codec substitutes for the host→device wire only — decode is exact —
so the detect pipeline must store byte-identical features either way.
"""

import numpy as np
import pytest

from imageanalysis_tpu.features import transport


def smooth_image(rng, h=96, w=128, amp=40):
    """Low-frequency field: row deltas almost always fit 4 bits."""
    import cv2

    base = rng.random((h // 8, w // 8)).astype(np.float32)
    img = cv2.resize(base, (w, h), interpolation=cv2.INTER_CUBIC)
    return np.clip(img * amp + 100, 0, 255).astype(np.uint8)


def test_roundtrip_smooth(rng):
    imgs = [smooth_image(rng), smooth_image(rng)]
    packs = [transport.pack_gray(im) for im in imgs]
    assert all(p is not None for p in packs)
    nib = np.stack([p[0] for p in packs])
    idx = np.stack([p[1] for p in packs])
    val = np.stack([p[2] for p in packs])
    out = np.asarray(transport.unpack_gray_batch(nib, idx, val))
    for i, im in enumerate(imgs):
        np.testing.assert_array_equal(out[i], im)


def test_roundtrip_planted_escapes(rng):
    img = smooth_image(rng)
    # plant hard edges (big deltas) well under the cap
    img[10:20, 30:90:7] = 255
    img[40:60, ::13] = 0
    p = transport.pack_gray(img)
    assert p is not None
    out = np.asarray(transport.unpack_gray_batch(
        p[0][None], p[1][None], p[2][None]))[0]
    np.testing.assert_array_equal(out, img)


def test_noise_falls_back(rng):
    noisy = rng.integers(0, 255, (96, 128)).astype(np.uint8)
    assert transport.pack_gray(noisy) is None


def test_odd_width_falls_back(rng):
    assert transport.pack_gray(
        np.zeros((16, 17), np.uint8)) is None


def test_compression_ratio_on_smooth(rng):
    img = smooth_image(rng, h=256, w=512)
    p = transport.pack_gray(img)
    assert p is not None
    payload = sum(a.nbytes for a in p)
    assert payload < 0.75 * img.nbytes


def test_detect_codec_vs_raw_parity(tmp_path, rng, monkeypatch):
    """detect_project_features must store byte-identical features with
    the codec on and off (same device math after decode)."""
    from imageanalysis_tpu.features.detect import (DetectorConfig,
                                                   detect_project_features)
    from test_sift_tpu import _FakeProj

    grays = [smooth_image(rng, 128, 128, amp=120) for _ in range(3)]
    results = {}
    for flag in ("1", "0"):
        monkeypatch.setenv("IMGTPU_DETECT_COMPRESS", flag)
        d = tmp_path / f"c{flag}"
        d.mkdir()
        proj = _FakeProj(grays, d)
        cfg = DetectorConfig(scale=1.0, max_features=128, equalize=False,
                             backend="tpu", device_batch=2)
        detect_project_features(proj, cfg, use_cache=False, progress=False)
        results[flag] = proj.store
    assert set(results["1"]) == set(results["0"])
    for name in results["1"]:
        for a, b in zip(results["1"][name], results["0"][name]):
            np.testing.assert_array_equal(a, b)
