"""New dense-patch SIFT: TPU timing at mission resolution."""
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

from imageanalysis_tpu.features import sift_tpu as S

B = int(sys.argv[1]) if len(sys.argv) > 1 else 4
UPS = bool(int(sys.argv[2])) if len(sys.argv) > 2 else False
H, W = 1440, 2176
rng = np.random.default_rng(0)
img = rng.uniform(0, 255, (B, H, W)).astype(np.float32)
try:
    import cv2
    for b in range(B):
        img[b] = cv2.GaussianBlur(img[b], (0, 0), 3.0)
    img = (img - img.min()) / (img.max() - img.min()) * 255
except ImportError:
    pass

print(f"B={B} {H}x{W} upsample={UPS} backend={jax.default_backend()}",
      flush=True)
t0 = time.perf_counter()
kp, meta, desc, valid = S.detect_and_compute_batch(img, 4096, max_chunk=B,
                                                   upsample=UPS)
print(f"compile+run: {time.perf_counter()-t0:.1f}s  K={kp.shape[1]} "
      f"valid/img={valid.sum(1).mean():.0f}", flush=True)
t0 = time.perf_counter()
n = 3
for _ in range(n):
    kp, meta, desc, valid = S.detect_and_compute_batch(img, 4096,
                                                       max_chunk=B,
                                                       upsample=UPS)
dt = (time.perf_counter() - t0) / n
print(f"steady e2e: {dt:.3f}s = {dt/B*1000:.1f} ms/img", flush=True)
