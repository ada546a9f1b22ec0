"""Mission-config detect loop decomposition at the PRODUCTION batch (B=2,
full-res 2176x1440, max_features 4096, device CLAHE) — locates the gap
between the 74 ms/img composite-kernel number and the 112 ms/img mission
steady-state tick.

  A. dispatch+finalize double-buffered over PRE-UPLOADED frames
     -> pure device+link wall per image (host decode excluded)
  B. dispatch-only (results leaked) -> dispatch-side floor
  D. full production path: detect_project_features-style loop with real
     JPEG decode + device_put in loader threads + cache writes, on real
     mission frames, split into (load wait / dispatch / finalize) shares.
"""

import os
import sys
import time
from collections import deque

import numpy as np

sys.path.insert(0, "/root/repo")
from imageanalysis_tpu.features import sift_tpu  # noqa: E402

import jax  # noqa: E402

N = 24
B = 2
MISSION = "/tmp/mission2812"
names = sorted(os.listdir(MISSION))
jpgs = [os.path.join(MISSION, n) for n in names if n.endswith(".jpg")][:N + 4]

import cv2  # noqa: E402

frames = []
for p in jpgs[:8]:
    img = cv2.imread(p, cv2.IMREAD_GRAYSCALE)
    frames.append(img)
H, W = frames[0].shape
print(f"frames {W}x{H}, B={B}")

# warm compile (same shapes as production: B=2 uint8 + device clahe)
dev = [jax.device_put(np.stack(frames[0:2]))]
p = sift_tpu.detect_dispatch(dev[0], 4096, equalize=True)
sift_tpu.detect_finalize_batch(p)

# pre-upload B=2 stacks
stacks = [jax.device_put(np.stack(frames[2 * i:2 * i + 2] or frames[:2]))
          for i in range(4)]
for s in stacks:
    s.block_until_ready()


def run_a():
    inflight = None
    t0 = time.perf_counter()
    for i in range(N // B):
        p = sift_tpu.detect_dispatch(stacks[i % 4], 4096, equalize=True)
        if inflight is not None:
            sift_tpu.detect_finalize_batch(inflight)
        inflight = p
    sift_tpu.detect_finalize_batch(inflight)
    return (time.perf_counter() - t0) / N


def run_b():
    keep = []
    t0 = time.perf_counter()
    for i in range(N // B):
        keep.append(sift_tpu.detect_dispatch(stacks[i % 4], 4096,
                                             equalize=True))
    sift_tpu.detect_finalize_batch(keep[-1])
    return (time.perf_counter() - t0) / N


def run_d():
    """Production-shaped loop on real files: loader threads decode+upload,
    main thread batches B=2, double-buffers, finalizes. Times the three
    main-thread waits separately."""
    import concurrent.futures as cf

    t_load = t_disp = t_fin = 0.0

    def load(path):
        img = cv2.imread(path, cv2.IMREAD_GRAYSCALE)
        return jax.device_put(img)

    files = jpgs[:N]
    with cf.ThreadPoolExecutor(max_workers=4) as loaders:
        window = deque(loaders.submit(load, f) for f in files[:8])
        src = iter(files[8:])
        inflight = None
        batch = []
        t0 = time.perf_counter()
        for _ in range(N):
            t = time.perf_counter()
            g = window.popleft().result()
            t_load += time.perf_counter() - t
            for f in src:
                window.append(loaders.submit(load, f))
                break
            batch.append(g)
            if len(batch) >= B:
                t = time.perf_counter()
                p = sift_tpu.detect_dispatch(batch, 4096, equalize=True)
                batch = []
                t_disp += time.perf_counter() - t
                if inflight is not None:
                    t = time.perf_counter()
                    sift_tpu.detect_finalize_batch(inflight)
                    t_fin += time.perf_counter() - t
                inflight = p
        if inflight is not None:
            sift_tpu.detect_finalize_batch(inflight)
        total = time.perf_counter() - t0
    return total / N, t_load / N, t_disp / N, t_fin / N


a = run_a()
print(f"A double-buffer pre-uploaded: {a*1000:.1f} ms/img")
b = run_b()
print(f"B dispatch-only floor:        {b*1000:.1f} ms/img")
d, dl, dd, df = run_d()
print(f"D production loop:            {d*1000:.1f} ms/img "
      f"(load-wait {dl*1000:.1f}, dispatch {dd*1000:.1f}, "
      f"finalize {df*1000:.1f})")
