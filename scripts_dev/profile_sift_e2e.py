"""End-to-end detector timing: numpy in -> numpy out, incl. transfers."""
import time

import jax
import jax.numpy as jnp
import numpy as np

from imageanalysis_tpu.features import sift_tpu as S

H, W = 1440, 2176
rng = np.random.default_rng(0)
imgs_np = (rng.uniform(0, 255, (8, H, W))).astype(np.float32)

print("backend:", jax.default_backend(), flush=True)

# warm up compile for chunk=4
_ = S.detect_and_compute_batch(imgs_np[:4], 4096)
t0 = time.perf_counter()
out = S.detect_and_compute_batch(imgs_np, 4096)
dt = time.perf_counter() - t0
print(f"detect_and_compute_batch B=8 (chunks of 4): {dt:.3f}s = {dt/8*1000:.1f} ms/img", flush=True)

# upload-only timing
t0 = time.perf_counter()
for s in range(0, 8, 4):
    x = jnp.asarray(imgs_np[s:s+4]) / 255.0
    x.block_until_ready()
dt = time.perf_counter() - t0
print(f"upload only: {dt:.3f}s", flush=True)

# device-only timing (inputs already on device)
dev = jnp.asarray(imgs_np[:4]) / 255.0
dev.block_until_ready()
n_oct = 5
per_oct = max(4096 // n_oct, 64)
r = S._detect_batch(dev, per_oct, n_oct)
jax.block_until_ready(r)
t0 = time.perf_counter()
for _ in range(4):
    r = S._detect_batch(dev, per_oct, n_oct)
    jax.block_until_ready(r)
dt = (time.perf_counter() - t0) / 4
print(f"device-only _detect_batch B=4: {dt:.3f}s = {dt/4*1000:.1f} ms/img", flush=True)

# download-only
t0 = time.perf_counter()
outs = [np.asarray(x) for x in r]
dt = time.perf_counter() - t0
print(f"download only: {dt:.3f}s  shapes={[o.shape for o in outs]}", flush=True)

# try B=8 on device (the crash case from round 1)
print("trying B=8 single call on device...", flush=True)
dev8 = jnp.asarray(imgs_np) / 255.0
dev8.block_until_ready()
try:
    t0 = time.perf_counter()
    r8 = S._detect_batch(dev8, per_oct, n_oct)
    jax.block_until_ready(r8)
    print(f"B=8 compile+run ok: {time.perf_counter()-t0:.2f}s", flush=True)
    t0 = time.perf_counter()
    r8 = S._detect_batch(dev8, per_oct, n_oct)
    jax.block_until_ready(r8)
    dt = time.perf_counter() - t0
    print(f"B=8 steady: {dt:.3f}s = {dt/8*1000:.1f} ms/img", flush=True)
except Exception as e:
    print("B=8 FAILED:", type(e).__name__, str(e)[:300], flush=True)
