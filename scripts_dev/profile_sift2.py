"""Careful SIFT profiling: force completion via host download of a scalar.

Natural-statistics images (smoothed noise), B configurable, per-stage
timings that each end in a tiny device->host transfer so the axon tunnel
cannot fake completion.
"""
import math
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from imageanalysis_tpu.features import sift_tpu as S

B = int(sys.argv[1]) if len(sys.argv) > 1 else 1
H, W = 1440, 2176
rng = np.random.default_rng(0)
# natural-ish: smoothed noise (octave spectrum)
img = rng.uniform(0, 1, (B, H, W)).astype(np.float32)
try:
    import cv2
    for b in range(B):
        img[b] = cv2.GaussianBlur(img[b], (0, 0), 3.0)
except ImportError:
    pass
img = (img - img.min()) / (img.max() - img.min())
imgs = jnp.asarray(img)
float(jnp.sum(imgs))  # force upload complete

n_octaves = max(int(math.log2(min(H, W) / 32.0)), 1)
per_octave = max(4096 // n_octaves, 64)
per_level = max(per_octave // S.N_SCALES, 32)
thresh = 0.5 * S.CONTRAST_THRESH / S.N_SCALES

print(f"B={B} {H}x{W} n_octaves={n_octaves} backend={jax.default_backend()}",
      flush=True)


def timeit(name, fn, n=3):
    s = fn(imgs)              # compile & warm
    _ = float(s)              # forces completion via scalar download
    t0 = time.perf_counter()
    for _i in range(n):
        _ = float(fn(imgs))
    dt = (time.perf_counter() - t0) / n
    print(f"{name:44s} {dt*1000:9.1f} ms ({dt/B*1000:8.1f} ms/img)",
          flush=True)


@jax.jit
def pyramid_only(imgs):
    s = jnp.float32(0)
    im = S._blur(imgs, S.SIGMA0)
    for o in range(n_octaves):
        gs, dogs = S._octave_stack(im, S.SIGMA0)
        s += sum(jnp.sum(d) for d in dogs)
        im = gs[S.N_SCALES][:, ::2, ::2]
    return s


@jax.jit
def pyr_extrema(imgs):
    s = jnp.float32(0)
    im = S._blur(imgs, S.SIGMA0)
    for o in range(n_octaves):
        gs, dogs = S._octave_stack(im, S.SIGMA0)
        for lvl in range(1, S.N_SCALES + 1):
            s += S._extrema_mask_level(dogs, lvl, thresh).sum()
        im = gs[S.N_SCALES][:, ::2, ::2]
    return s


@jax.jit
def pyr_extrema_topk(imgs):
    s = jnp.float32(0)
    im = S._blur(imgs, S.SIGMA0)
    for o in range(n_octaves):
        gs, dogs = S._octave_stack(im, S.SIGMA0)
        Bq, Hq, Wq = gs[0].shape
        for lvl in range(1, S.N_SCALES + 1):
            mask = S._extrema_mask_level(dogs, lvl, thresh)
            score = jnp.where(mask, jnp.abs(dogs[lvl]), 0.0).reshape(Bq, -1)
            vals, flat = jax.lax.approx_max_k(score, per_level,
                                              recall_target=0.95)
            s += jnp.sum(vals) + jnp.sum(flat).astype(jnp.float32)
        im = gs[S.N_SCALES][:, ::2, ::2]
    return s


@jax.jit
def full_sum(imgs):
    kp, meta, desc, valid = S._detect_batch(imgs, per_octave, n_octaves)
    return jnp.sum(kp) + jnp.sum(desc) + jnp.sum(valid)


for name, fn in [("pyramid only", pyramid_only),
                 ("pyramid+extrema", pyr_extrema),
                 ("pyramid+extrema+topk", pyr_extrema_topk),
                 ("FULL detect", full_sum)]:
    try:
        timeit(name, fn)
    except Exception as e:
        print(f"{name} FAILED: {type(e).__name__} {str(e)[:200]}", flush=True)
        break
print("done", flush=True)
