"""Grid Motion Statistics filter shim (cv2.xfeatures2d.matchGMS).

cv2 5.0 in this environment ships without opencv-contrib's xfeatures2d, but
the reference's basic_pair_matches calls matchGMS unconditionally
(reference matcher.py:285). This is an independent numpy implementation of
the GMS idea (Bian et al., CVPR 2017): partition both images into G x G
grids, count supporting matches per cell pair, and keep matches whose cell
pair's 3x3-neighborhood support exceeds tau = alpha * sqrt(mean support per
supporting cell). Four half-cell grid shifts are evaluated and a match
passes if any shift accepts it (the original uses the shifts to de-alias
cell boundaries).

Not bit-identical to OpenCV's implementation (rotation patterns are not
enumerated; nadir survey pairs have near-identity rotation, which the
reference also assumes by seeding with a homography) — PARITY_r4.json's
comparison metrics absorb the residual difference.
"""

from __future__ import annotations

import numpy as np

_GRID = 20
_ALPHA = 6.0


def _accept_mask(pts1, pts2, size1, size2, threshold_factor, sx, sy):
    g = _GRID
    w1, h1 = float(size1[0]), float(size1[1])
    w2, h2 = float(size2[0]), float(size2[1])
    # half-cell shifted grid assignment
    c1x = np.clip(((pts1[:, 0] / w1 + sx / (2.0 * g)) * g).astype(int),
                  0, g - 1)
    c1y = np.clip(((pts1[:, 1] / h1 + sy / (2.0 * g)) * g).astype(int),
                  0, g - 1)
    c2x = np.clip(((pts2[:, 0] / w2 + sx / (2.0 * g)) * g).astype(int),
                  0, g - 1)
    c2y = np.clip(((pts2[:, 1] / h2 + sy / (2.0 * g)) * g).astype(int),
                  0, g - 1)
    ca = c1y * g + c1x
    cb = c2y * g + c2x

    votes = np.zeros((g * g, g * g), np.float64)
    np.add.at(votes, (ca, cb), 1.0)

    V = votes.reshape(g, g, g, g)

    def conv3(x, axis):
        out = x.copy()
        lo = np.roll(x, 1, axis=axis)
        hi = np.roll(x, -1, axis=axis)
        sl_first = [slice(None)] * x.ndim
        sl_first[axis] = 0
        sl_last = [slice(None)] * x.ndim
        sl_last[axis] = -1
        lo[tuple(sl_first)] = 0.0
        hi[tuple(sl_last)] = 0.0
        return out + lo + hi

    S = V
    occ = (V > 0).astype(np.float64)
    n_cells = occ
    for ax in range(4):
        S = conv3(S, ax)
        n_cells = conv3(n_cells, ax)
    S = S.reshape(g * g, g * g)
    n_cells = n_cells.reshape(g * g, g * g)
    mean = S / np.maximum(n_cells, 1.0)
    tau = (threshold_factor if threshold_factor > 0 else _ALPHA) \
        * np.sqrt(np.maximum(mean, 0.0))
    accept = S > tau
    return accept[ca, cb]


def matchGMS(size1, size2, keypoints1, keypoints2, matches1to2,
             withRotation=False, withScale=False, thresholdFactor=6.0):
    if not matches1to2:
        return []
    pts1 = np.array([keypoints1[m.queryIdx].pt for m in matches1to2],
                    dtype=np.float64)
    pts2 = np.array([keypoints2[m.trainIdx].pt for m in matches1to2],
                    dtype=np.float64)
    keep = np.zeros(len(matches1to2), bool)
    for sx, sy in ((0, 0), (1, 0), (0, 1), (1, 1)):
        keep |= _accept_mask(pts1, pts2, size1, size2, thresholdFactor,
                             sx, sy)
    return [m for m, k in zip(matches1to2, keep) if k]
