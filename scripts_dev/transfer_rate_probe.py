"""Tunnel transfer-rate characterization: is ~19 MB/s a hard link rate or
a per-transfer window artifact? Times:
  - upload 1x 3.1 MB (mission frame) with dependent-scalar sync
  - upload 8x 3.1 MB enqueued back-to-back, one sync
  - upload 1x 25 MB (8 frames in one array)
  - download 0.64 MB / 5 MB packed-result-sized buffers
"""

import time
import sys

import numpy as np
import jax
import jax.numpy as jnp

H, W = 1440, 2176
frame = np.random.default_rng(0).integers(0, 255, (H, W), np.uint8)
big = np.stack([frame] * 8)


@jax.jit
def touch(x, salt):
    return jnp.sum(x, dtype=jnp.int32) * 0 + salt


def sync(*arrs):
    s = jnp.zeros((), jnp.int32)
    for a in arrs:
        s = s + touch(a, 0)
    return int(s)


# warm the compile
sync(jnp.asarray(frame))
sync(jnp.asarray(big))

for name, fn in [
    ("upload 1x3.1MB", lambda: sync(jnp.asarray(frame))),
    ("upload 8x3.1MB separate", lambda: sync(*[jnp.asarray(frame + i)
                                               for i in range(8)])),
    ("upload 1x25MB stacked", lambda: sync(jnp.asarray(big))),
]:
    ts = []
    for rep in range(4):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    best = min(ts)
    mb = 3.1 if "1x3.1" in name else 25.0
    print(f"{name}: best {best*1000:.1f} ms -> {mb/best:.1f} MB/s")

# downloads
dev_small = jnp.asarray(np.zeros((4096, 39), np.int32))
dev_big = jnp.asarray(np.zeros((8, 4096, 39), np.int32))
sync(dev_small); sync(dev_big)
for name, arr, mb in [("download 0.64MB", dev_small, 0.64),
                      ("download 5.1MB", dev_big, 5.11)]:
    ts = []
    for rep in range(4):
        t0 = time.perf_counter()
        np.asarray(arr)
        ts.append(time.perf_counter() - t0)
    best = min(ts)
    print(f"{name}: best {best*1000:.1f} ms -> {mb/best:.1f} MB/s")

# upload while device computes: dispatch a ~90 ms matmul chain, then
# immediately upload a frame; if link and compute overlap, the upload
# finishes "free" inside the compute window
a = jnp.asarray(np.random.default_rng(1).standard_normal(
    (4096, 4096)).astype(np.float32))


@jax.jit
def burn(x, n=12):
    def body(c, _):
        return c @ x * (1.0 / 64.0), None
    y, _ = jax.lax.scan(body, x, None, length=n)
    return jnp.sum(y)


float(burn(a))
t0 = time.perf_counter()
r = burn(a)
up = jnp.asarray(frame)
s = int(touch(up, 0))
t_up = time.perf_counter() - t0
float(r)
t_all = time.perf_counter() - t0
print(f"overlap: upload-synced at {t_up*1000:.1f} ms, "
      f"burn total {t_all*1000:.1f} ms")
