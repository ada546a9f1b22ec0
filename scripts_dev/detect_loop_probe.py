"""Mission-scale (2176x1440) detect loop decomposition:
  A. dispatch+finalize double-buffered over in-memory frames (no host
     decode, no cache writes) -> device+link wall per image
  B. same but finalize skipped (results leaked) -> dispatch-side floor
  C. pipeline depth 3 instead of 1 inflight
"""

import time
import sys

import numpy as np

sys.path.insert(0, "/root/repo")
from imageanalysis_tpu.features import sift_tpu

N = 12
H, W = 1440, 2176
rng = np.random.default_rng(0)
base = rng.integers(0, 255, (H, W), np.uint8)
# smooth it so extrema counts are realistic-ish
import cv2
base = cv2.GaussianBlur(base, (0, 0), 2.0)
frames = [np.clip(base.astype(np.int16) + rng.integers(-8, 8, (H, W)),
                  0, 255).astype(np.uint8) for _ in range(4)]

# warm compile
p = sift_tpu.detect_dispatch(frames[0], 4096)
sift_tpu.detect_finalize_batch(p)


def run_a():
    inflight = None
    t0 = time.perf_counter()
    for i in range(N):
        p = sift_tpu.detect_dispatch(frames[i % 4], 4096)
        if inflight is not None:
            sift_tpu.detect_finalize_batch(inflight)
        inflight = p
    sift_tpu.detect_finalize_batch(inflight)
    return (time.perf_counter() - t0) / N


def run_b():
    keep = []
    t0 = time.perf_counter()
    for i in range(N):
        keep.append(sift_tpu.detect_dispatch(frames[i % 4], 4096))
    sift_tpu.detect_finalize_batch(keep[-1])   # sync the chain tail
    return (time.perf_counter() - t0) / N


def run_c(depth=3):
    from collections import deque
    q = deque()
    t0 = time.perf_counter()
    for i in range(N):
        q.append(sift_tpu.detect_dispatch(frames[i % 4], 4096))
        if len(q) > depth:
            sift_tpu.detect_finalize_batch(q.popleft())
    while q:
        sift_tpu.detect_finalize_batch(q.popleft())
    return (time.perf_counter() - t0) / N


for name, fn in [("A double-buffer", run_a), ("B dispatch-only", run_b),
                 ("C depth-3", run_c)]:
    dt = fn()
    print(f"{name}: {dt*1000:.1f} ms/img")
