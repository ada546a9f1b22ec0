"""Measure cv2-SIFT parity of the dense-patch TPU detector on real imagery.

Feature counts, and cross-engine descriptor matching (our descriptors on
image A vs cv2 descriptors on warped image B) under a planted homography.
Run on CPU: JAX_PLATFORM_NAME=cpu python scripts_dev/parity_cv2.py
"""
import os
os.environ.setdefault("JAX_PLATFORM_NAME", "cpu")
import jax
jax.config.update("jax_platforms", "cpu")

import cv2
import numpy as np
import jax.numpy as jnp

from imageanalysis_tpu.features import sift_tpu
from imageanalysis_tpu.ops import knn

img = cv2.imread("/root/reference/images/bates.jpg")
gray = cv2.cvtColor(img, cv2.COLOR_BGR2GRAY)
scale = 0.4
g1 = cv2.resize(gray, (0, 0), fx=scale, fy=scale)
H = np.array([[0.985, 0.04, -20.0], [-0.035, 1.01, 12.0],
              [2e-6, -1e-6, 1.0]])
g2 = cv2.warpPerspective(g1, H, (g1.shape[1], g1.shape[0]))
print("size:", g1.shape)

sift = cv2.SIFT_create()
kc1, dc1 = sift.detectAndCompute(g1, None)
kc2, dc2 = sift.detectAndCompute(g2, None)
print(f"cv2 counts: {len(kc1)}, {len(kc2)}")

kt1, mt1, dt1 = sift_tpu.detect_and_compute(g1, max_features=20000,
                                            upsample=True)
kt2, mt2, dt2 = sift_tpu.detect_and_compute(g2, max_features=20000,
                                            upsample=True)
print(f"tpu counts: {len(kt1)}, {len(kt2)}  "
      f"(ratio {len(kt1)/len(kc1):.2f}, {len(kt2)/len(kc2):.2f})")


def match(desc_a, uv_a, desc_b, uv_b, tag):
    npad = 1 << int(np.ceil(np.log2(max(len(desc_a), len(desc_b), 2))))
    pa = knn.pad_descriptors(jnp.asarray(desc_a), npad)
    pb = knn.pad_descriptors(jnp.asarray(desc_b), npad)
    bj, ok = knn.match_pair_dense(pa, pb, len(desc_a), len(desc_b),
                                  ratio=0.8, bf16=False)
    ok = np.array(ok); bj = np.array(bj)
    ia = np.nonzero(ok)[0]
    uv1 = uv_a[ia]; uv2 = uv_b[bj[ia]]
    ph = np.c_[uv1, np.ones(len(uv1))] @ H.T
    pred = ph[:, :2] / ph[:, 2:3]
    err = np.linalg.norm(pred - uv2, axis=1)
    frac = float((err < 3.0).mean()) if len(err) else 0.0
    print(f"{tag}: raw={len(ia)} inlier_frac={frac:.3f} "
          f"inliers={int((err<3.0).sum())}")
    return len(ia), frac


match(dc1, np.array([k.pt for k in kc1]), dc2,
      np.array([k.pt for k in kc2]), "cv2 vs cv2 ")
match(dt1, kt1, dt2, kt2, "tpu vs tpu ")
match(dt1, kt1, dc2, np.array([k.pt for k in kc2]), "tpu vs cv2 ")
match(dc1, np.array([k.pt for k in kc1]), dt2, kt2, "cv2 vs tpu ")
