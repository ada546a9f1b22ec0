"""Probe: does the Gaussian-pyramid fusion survive image batch B>1?
The r2 bisect showed a TPU worker crash at B>1 near 3 MP full-res; the
detector therefore chunked B=1. This qualifies the small-frame region
the auto policy (features/detect.py:_auto_device_batch) enables.

Measured 2026-08-17 on the axon chip:
  870x576  (0.5 MP, 2176x1440 at scale 0.4):
    B=1 260 ms/img, B=2 183, B=4 124, B=8 96 ms/img  (all stable)
  1088x720 (0.78 MP): TPU worker CRASHED at B>1 — the crash boundary is
    not simply total pixels (0.5 MP x 8 = 4 MP is fine, 0.78 MP x 2 is
    not). The auto policy therefore only batches frames <= 0.56 MP.
"""
import time
import numpy as np
import jax
from imageanalysis_tpu.features import sift_tpu

print("backend:", jax.default_backend())
rng = np.random.default_rng(0)
for H, W in ((576, 870), (720, 1088)):
    for B in (1, 2, 4, 8):
        if B * H * W > 4_500_000:
            continue
        imgs = (rng.random((B, H, W)) * 255).astype(np.uint8)
        t0 = time.perf_counter()
        kp, meta, desc, valid = sift_tpu.detect_and_compute_batch(
            imgs, max_features=4096, max_chunk=B)
        t1 = time.perf_counter()
        # second call = warm timing
        imgs2 = (rng.random((B, H, W)) * 255).astype(np.uint8)
        t2 = time.perf_counter()
        kp, meta, desc, valid = sift_tpu.detect_and_compute_batch(
            imgs2, max_features=4096, max_chunk=B)
        t3 = time.perf_counter()
        n = int(valid.sum())
        print(f"{W}x{H} B={B}: ok, {n} kp, compile+run {t1-t0:.1f}s, "
              f"warm {t3-t2:.3f}s ({(t3-t2)/B*1000:.0f} ms/img)",
              flush=True)
print("PROBE DONE")
