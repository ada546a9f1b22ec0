"""Real-imagery match parity vs the reference matcher stack (VERDICT r3
missing #2).

PARITY_r4.json proves graph-level equivalence head-to-head with the
actual reference pipeline on synthetic missions; this test closes the
remaining gap — "we find the matches the reference finds" on REAL
aerial texture. Pairs are derived from bates.jpg (the reference's own
sample mosaic) with KNOWN homographies, then matched two ways:

  reference semantics: cv2 SIFT -> FLANN KDTree(trees=5, checks=100)
    knnMatch k=2 -> ratio 0.75 -> cv2.findHomography RANSAC with
    tol = w**0.25 (reference matcher.py:43-80, :203-300, :90-142);
  ours: features/sift_tpu detect -> match.matcher.match_pair_batch
    (packed 2-NN + ratio + mutual + homography RANSAC).

Gates:
  - both sides' surviving matches are GT-consistent (the known H maps
    endpoint to endpoint within 3 px) at >= 0.90;
  - per-pair inlier-set overlap: ours recalls >= 60% of the reference's
    GT-consistent inliers within 2 px at both endpoints (detectors
    differ, so recall is bounded by keypoint-repeatability, ~70-80%
    between independent SIFT implementations).
"""

import os

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

BATES = "/root/reference/images/bates.jpg"
RATIO = 0.75

pytestmark = pytest.mark.skipif(not os.path.isfile(BATES),
                                reason="no real test photo")


def _pairs():
    """(g1, g2, H) triplets: bates.jpg at the reference's 0.4 detect scale
    warped by known homographies (shift / rotate+scale / perspective)."""
    img = cv2.imread(BATES)
    gray = cv2.cvtColor(img, cv2.COLOR_BGR2GRAY)
    g1 = cv2.resize(gray, (0, 0), fx=0.4, fy=0.4)
    h, w = g1.shape
    Hs = [
        np.array([[1.0, 0.0, -18.0], [0.0, 1.0, 11.0], [0, 0, 1.0]]),
        np.array([[0.97, 0.06, -8.0], [-0.06, 0.97, 4.0], [0, 0, 1.0]]),
        np.array([[0.99, 0.02, -12.0], [-0.01, 1.02, 7.0],
                  [4e-6, -3e-6, 1.0]]),
    ]
    out = []
    for H in Hs:
        g2 = cv2.warpPerspective(g1, H, (w, h))
        out.append((g1, g2, H))
    return out


def _ref_matches(g1, g2):
    """The reference's matching stack, run for real via cv2."""
    sift = cv2.SIFT_create()
    k1, d1 = sift.detectAndCompute(g1, None)
    k2, d2 = sift.detectAndCompute(g2, None)
    fl = cv2.FlannBasedMatcher({"algorithm": 1, "trees": 5},
                               {"checks": 100})
    raw = fl.knnMatch(d1, d2, k=2)
    good = [m[0] for m in raw
            if len(m) == 2 and m[0].distance <= m[1].distance * RATIO]
    if len(good) < 8:
        return np.zeros((0, 2)), np.zeros((0, 2))
    src = np.float32([k1[m.queryIdx].pt for m in good])
    dst = np.float32([k2[m.trainIdx].pt for m in good])
    tol = float(g1.shape[1]) ** 0.25
    _, mask = cv2.findHomography(src, dst, cv2.RANSAC, tol)
    keep = mask.ravel().astype(bool)
    return src[keep], dst[keep]


def _our_matches(g1, g2):
    """Our production pair path: TPU-native SIFT + fused device matcher."""
    import jax
    import jax.numpy as jnp

    from imageanalysis_tpu.features import sift_tpu
    from imageanalysis_tpu.match.matcher import match_pair_batch
    from imageanalysis_tpu.ops import knn

    # the production budget (features/detect.py default): cv2's side runs
    # uncapped and lands near ~4000 kp on these frames, so equal budgets
    kp1, _, d1 = sift_tpu.detect_and_compute(g1, max_features=4096,
                                             upsample=True)
    kp2, _, d2 = sift_tpu.detect_and_compute(g2, max_features=4096,
                                             upsample=True)
    npad = 4096
    da = knn.pad_descriptors(jnp.asarray(d1), npad)[None]
    db = knn.pad_descriptors(jnp.asarray(d2), npad)[None]
    ua = np.zeros((1, npad, 2), np.float32)
    ub = np.zeros((1, npad, 2), np.float32)
    ua[0, : len(kp1)] = np.asarray(kp1)[:, :2]
    ub[0, : len(kp2)] = np.asarray(kp2)[:, :2]
    n_a = jnp.asarray([len(kp1)], jnp.int32)
    n_b = jnp.asarray([len(kp2)], jnp.int32)
    keys = jax.random.split(jax.random.PRNGKey(7), 1)
    K = jnp.asarray(np.array([[1000.0, 0, g1.shape[1] / 2],
                              [0, 1000.0, g1.shape[0] / 2],
                              [0, 0, 1]], np.float32))
    tol = float(g1.shape[1]) ** 0.25
    best_j, ok = match_pair_batch(da, db, jnp.asarray(ua), jnp.asarray(ub),
                                  n_a, n_b, keys, K, thresh=tol,
                                  use_pallas=False, bf16=False)
    ok = np.asarray(ok[0])
    bj = np.asarray(best_j[0])
    rows = np.nonzero(ok)[0]
    rows = rows[rows < len(kp1)]
    cols = bj[rows]
    valid = cols < len(kp2)
    rows, cols = rows[valid], cols[valid]
    return ua[0, rows], ub[0, cols]


def _gt_frac(src, dst, H, tol=3.0):
    if len(src) == 0:
        return 0.0
    ph = (H @ np.c_[src, np.ones(len(src))].T).T
    pred = ph[:, :2] / ph[:, 2:3]
    err = np.linalg.norm(pred - dst, axis=1)
    return float((err < tol).mean())


def _recall(src_ref, dst_ref, src_ours, dst_ours, tol=2.0):
    """Fraction of reference matches with an endpoint-close match of ours."""
    if len(src_ref) == 0 or len(src_ours) == 0:
        return 0.0
    d1 = np.linalg.norm(src_ref[:, None] - src_ours[None], axis=2)
    d2 = np.linalg.norm(dst_ref[:, None] - dst_ours[None], axis=2)
    hit = ((d1 < tol) & (d2 < tol)).any(axis=1)
    return float(hit.mean())


def test_real_pair_inlier_overlap():
    results = []
    for g1, g2, H in _pairs():
        sr, dr = _ref_matches(g1, g2)
        so, do = _our_matches(g1, g2)
        gt_ref = _gt_frac(sr, dr, H)
        gt_ours = _gt_frac(so, do, H)
        # recall measured against the reference's GT-CONSISTENT inliers
        ph = (H @ np.c_[sr, np.ones(len(sr))].T).T
        errs = np.linalg.norm(ph[:, :2] / ph[:, 2:3] - dr, axis=1)
        good = errs < 3.0
        rec = _recall(sr[good], dr[good], so, do)
        results.append((len(sr), len(so), gt_ref, gt_ours, rec))

    for n_ref, n_ours, gt_ref, gt_ours, rec in results:
        assert n_ref > 100 and n_ours > 100, results
        assert gt_ref >= 0.90, results
        assert gt_ours >= 0.90, results
        assert rec >= 0.60, results
