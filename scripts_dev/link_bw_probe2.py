"""Upload bandwidth with the CHAINED-SCALAR protocol (block_until_ready
returns early on axon — fold a data dependency through and fetch it)."""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

rng = np.random.default_rng(0)
f = jax.jit(lambda x: x.astype(jnp.float32).sum())

# warm both shapes
for s in [(8, 8), (1440, 2176), (2, 1440, 2176)]:
    float(f(np.zeros(s, np.uint8)))

# baseline RTT: tiny upload + sum + scalar fetch
ts = []
tiny = np.zeros((8, 8), np.uint8)
for _ in range(7):
    t = time.perf_counter()
    float(f(tiny))
    ts.append(time.perf_counter() - t)
rtt = sorted(ts)[3]
print(f"tiny roundtrip: {rtt*1000:.1f} ms")

for name, arr in [("u8 3.1MB", rng.integers(0, 255, (1440, 2176)).astype(np.uint8)),
                  ("u8 pair 6.2MB", rng.integers(0, 255, (2, 1440, 2176)).astype(np.uint8))]:
    ts = []
    for _ in range(7):
        t = time.perf_counter()
        float(f(arr))
        ts.append(time.perf_counter() - t)
    med = sorted(ts)[3]
    print(f"roundtrip {name}: {med*1000:.1f} ms -> upload ~{(med-rtt)*1000:.1f} ms "
          f"({arr.nbytes/1e6/max(med-rtt,1e-9):.1f} MB/s)")

# and the real detect compute wall at B=2, chained (no host decode):
from imageanalysis_tpu.features import sift_tpu  # noqa: E402
pair = rng.integers(0, 255, (2, 1440, 2176)).astype(np.uint8)
import cv2  # noqa: E402
pair = np.stack([cv2.GaussianBlur(p, (0, 0), 2.0) for p in pair])
pk = sift_tpu.detect_dispatch(pair, 4096, equalize=True)
sift_tpu.detect_finalize_batch(pk)         # warm
ts = []
for _ in range(5):
    t = time.perf_counter()
    pk = sift_tpu.detect_dispatch(jax.device_put(pair), 4096, equalize=True)
    sift_tpu.detect_finalize_batch(pk)      # np.asarray = real fetch
    ts.append(time.perf_counter() - t)
med = sorted(ts)[2]
print(f"synchronous upload+detect+download B=2: {med*1000:.1f} ms "
      f"({med/2*1000:.1f} ms/img)")
