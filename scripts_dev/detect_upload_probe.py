"""Is the detect steady-state gap upload serialization or client lock
contention?

  G. raw link: synchronous device_put of (H,W) and (2,H,W) uint8
  H. does an upload overlap a running detect compute?
  E. loop variant: loaders decode only; MAIN thread uploads the stacked
     pair right before dispatch (no cross-thread client traffic)
  F. loop variant: loader uploads the stacked PAIR (one device_put per
     batch from the loader thread; no eager jnp.stack in dispatch)
"""

import os
import sys
import time
from collections import deque

import numpy as np

sys.path.insert(0, "/root/repo")
from imageanalysis_tpu.features import sift_tpu  # noqa: E402

import jax  # noqa: E402
import cv2  # noqa: E402

N = 24
B = 2
MISSION = "/tmp/mission2812"
names = sorted(os.listdir(MISSION))
jpgs = [os.path.join(MISSION, n) for n in names if n.endswith(".jpg")][:N + 4]
frames = [cv2.imread(p, cv2.IMREAD_GRAYSCALE) for p in jpgs[:8]]
H, W = frames[0].shape

# warm
p = sift_tpu.detect_dispatch(jax.device_put(np.stack(frames[:2])), 4096,
                             equalize=True)
sift_tpu.detect_finalize_batch(p)

one = frames[0]
pair = np.stack(frames[:2])

# G: raw upload timing (synchronous via block_until_ready + chained use)
for name, arr in [("1 img (3.1MB)", one), ("pair (6.2MB)", pair)]:
    ts = []
    for _ in range(6):
        t = time.perf_counter()
        d = jax.device_put(arr)
        d.block_until_ready()
        ts.append(time.perf_counter() - t)
    print(f"G upload {name}: median {sorted(ts)[len(ts)//2]*1000:.1f} ms "
          f"(min {min(ts)*1000:.1f})")

# H: upload while compute in flight — dispatch detect, then time an upload
d0 = jax.device_put(pair)
d0.block_until_ready()
t = time.perf_counter()
pk = sift_tpu.detect_dispatch(d0, 4096, equalize=True)   # ~140 ms compute
tu = time.perf_counter()
d1 = jax.device_put(pair)
d1.block_until_ready()
t_up = time.perf_counter() - tu
sift_tpu.detect_finalize_batch(pk)
t_all = time.perf_counter() - t
print(f"H upload-during-compute: upload wall {t_up*1000:.1f} ms, "
      f"dispatch+upload+finalize total {t_all*1000:.1f} ms")


def loop(upload_mode):
    import concurrent.futures as cf

    t_load = t_up = t_disp = t_fin = 0.0

    if upload_mode == "main":
        def load(path):
            return cv2.imread(path, cv2.IMREAD_GRAYSCALE)
    else:  # pair upload in loader
        def load2(p1, p2):
            a = np.stack([cv2.imread(p1, cv2.IMREAD_GRAYSCALE),
                          cv2.imread(p2, cv2.IMREAD_GRAYSCALE)])
            return jax.device_put(a)

    files = jpgs[:N]
    with cf.ThreadPoolExecutor(max_workers=4) as loaders:
        inflight = None
        t0 = time.perf_counter()
        if upload_mode == "main":
            window = deque(loaders.submit(load, f) for f in files[:8])
            src = iter(files[8:])
            batch = []
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
                    dev = jax.device_put(np.stack(batch))
                    batch = []
                    t_up += time.perf_counter() - t
                    t = time.perf_counter()
                    pk = sift_tpu.detect_dispatch(dev, 4096, equalize=True)
                    t_disp += time.perf_counter() - t
                    if inflight is not None:
                        t = time.perf_counter()
                        sift_tpu.detect_finalize_batch(inflight)
                        t_fin += time.perf_counter() - t
                    inflight = pk
        else:
            pairs = [(files[i], files[i + 1]) for i in range(0, N, 2)]
            window = deque(loaders.submit(load2, *pr) for pr in pairs[:4])
            src = iter(pairs[4:])
            for _ in range(len(pairs)):
                t = time.perf_counter()
                dev = window.popleft().result()
                t_load += time.perf_counter() - t
                for pr in src:
                    window.append(loaders.submit(load2, *pr))
                    break
                t = time.perf_counter()
                pk = sift_tpu.detect_dispatch(dev, 4096, equalize=True)
                t_disp += time.perf_counter() - t
                if inflight is not None:
                    t = time.perf_counter()
                    sift_tpu.detect_finalize_batch(inflight)
                    t_fin += time.perf_counter() - t
                inflight = pk
        if inflight is not None:
            sift_tpu.detect_finalize_batch(inflight)
        total = time.perf_counter() - t0
    return total / N, t_load / N, t_up / N, t_disp / N, t_fin / N


for mode in ("main", "pair"):
    tt, tl, tu, td, tf = loop(mode)
    print(f"{'E main-thread upload' if mode == 'main' else 'F pair-in-loader'}:"
          f" {tt*1000:.1f} ms/img (load {tl*1000:.1f}, up {tu*1000:.1f}, "
          f"disp {td*1000:.1f}, fin {tf*1000:.1f})")
