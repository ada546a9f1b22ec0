"""Pure device compute per image for the codec detect path at B=2/4/8
(payloads pre-staged on device; chained timing via finalize fetch)."""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
import cv2  # noqa: E402
import jax  # noqa: E402

from imageanalysis_tpu.features import sift_tpu, transport  # noqa: E402

frames = [cv2.imread(f"/tmp/mission2812/IMG_{i:04d}.jpg",
                     cv2.IMREAD_GRAYSCALE) for i in range(100, 108)]
H, W = frames[0].shape
packs = [transport.pack_gray(f) for f in frames]
assert all(p is not None for p in packs)

for B in (2, 4, 8):
    nib = jax.device_put(np.stack([p[0] for p in packs[:B]]))
    idx = jax.device_put(np.stack([p[1] for p in packs[:B]]))
    val = jax.device_put(np.stack([p[2] for p in packs[:B]]))
    pk = sift_tpu.detect_dispatch_codec(nib, idx, val, (H, W), 4096,
                                        equalize=True)
    sift_tpu.detect_finalize_batch(pk)       # warm
    reps = 6
    t0 = time.perf_counter()
    for _ in range(reps):
        pk = sift_tpu.detect_dispatch_codec(nib, idx, val, (H, W), 4096,
                                            equalize=True)
    sift_tpu.detect_finalize_batch(pk)
    dt = (time.perf_counter() - t0) / (reps * B)
    print(f"B={B}: compute+1dl {dt*1000:.1f} ms/img", flush=True)
