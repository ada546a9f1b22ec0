"""Bisect the TPU worker crash at B=4, 3MP: run one pipeline prefix per
process (argv[1] = stage name), force full completion via downloads.
"""
import math
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from imageanalysis_tpu.features import sift_tpu as S

stage = sys.argv[1]
B = int(sys.argv[2]) if len(sys.argv) > 2 else 4
H, W = 1440, 2176
rng = np.random.default_rng(0)
img = rng.uniform(0, 255, (B, H, W)).astype(np.float32)
import cv2
for b in range(B):
    img[b] = cv2.GaussianBlur(img[b], (0, 0), 3.0)
imgs = jnp.asarray(img / 255.0)
n_octaves = 5
per_octave = max(4096 // n_octaves, 64)
per_level = max(per_octave // S.N_SCALES, 32)
thresh = 0.5 * S.CONTRAST_THRESH / S.N_SCALES
print(f"stage={stage} B={B} backend={jax.default_backend()}", flush=True)


@jax.jit
def pyr(imgs):
    acc = jnp.float32(0)
    im = S._blur(imgs, math.sqrt(S.SIGMA0**2 - 0.25))
    for o in range(n_octaves):
        gs, dogs = S._octave_stack(im, S.SIGMA0)
        acc += sum(jnp.sum(d) for d in dogs)
        im = gs[S.N_SCALES][:, ::2, ::2]
    return acc


@jax.jit
def topk(imgs):
    acc = jnp.float32(0)
    im = S._blur(imgs, math.sqrt(S.SIGMA0**2 - 0.25))
    for o in range(n_octaves):
        gs, dogs = S._octave_stack(im, S.SIGMA0)
        Bq, Hq, Wq = gs[0].shape
        for lvl in range(1, S.N_SCALES + 1):
            mask = S._extrema_mask_level(dogs, lvl, thresh)
            score = jnp.where(mask, jnp.abs(dogs[lvl]), 0.0).reshape(Bq, -1)
            vals, flat = jax.lax.approx_max_k(score, per_level,
                                              recall_target=0.95)
            acc += jnp.sum(vals) + jnp.sum(flat).astype(jnp.float32)
        im = gs[S.N_SCALES][:, ::2, ::2]
    return acc


@jax.jit
def refine(imgs):
    acc = jnp.float32(0)
    im = S._blur(imgs, math.sqrt(S.SIGMA0**2 - 0.25))
    for o in range(n_octaves):
        gs, dogs = S._octave_stack(im, S.SIGMA0)
        Bq, Hq, Wq = gs[0].shape
        for lvl in range(1, S.N_SCALES + 1):
            mask = S._extrema_mask_level(dogs, lvl, thresh)
            score = jnp.where(mask, jnp.abs(dogs[lvl]), 0.0).reshape(Bq, -1)
            vals, flat = jax.lax.approx_max_k(score, per_level,
                                              recall_target=0.95)
            y_idx = (flat // Wq).astype(jnp.int32)
            x_idx = (flat % Wq).astype(jnp.int32)
            dog3 = (dogs[lvl - 1], dogs[lvl], dogs[lvl + 1])

            def per_image(dm, dc, dp, y_i, x_i, lvl=lvl):
                def one(y, x):
                    ds, dy, dx, c, e, _yc, _xc = S._refine((dm, dc, dp), y, x)
                    return ds + dy + dx + c + e
                return jax.vmap(one)(y_i, x_i)
            r = jax.vmap(per_image)(dog3[0], dog3[1], dog3[2], y_idx, x_idx)
            acc += jnp.sum(r)
        im = gs[S.N_SCALES][:, ::2, ::2]
    return acc


@jax.jit
def patches(imgs):
    acc = jnp.float32(0)
    im = S._blur(imgs, math.sqrt(S.SIGMA0**2 - 0.25))
    for o in range(n_octaves):
        gs, dogs = S._octave_stack(im, S.SIGMA0)
        Bq, Hq, Wq = gs[0].shape
        for lvl in range(1, S.N_SCALES + 1):
            mask = S._extrema_mask_level(dogs, lvl, thresh)
            score = jnp.where(mask, jnp.abs(dogs[lvl]), 0.0).reshape(Bq, -1)
            vals, flat = jax.lax.approx_max_k(score, per_level,
                                              recall_target=0.95)
            y_idx = (flat // Wq).astype(jnp.int32)
            x_idx = (flat % Wq).astype(jnp.int32)
            p, y0, x0 = jax.vmap(
                lambda g, y, x: S._extract_patches(g, y, x))(
                gs[lvl], y_idx, x_idx)
            acc += jnp.sum(p) + jnp.sum(y0).astype(jnp.float32)
        im = gs[S.N_SCALES][:, ::2, ::2]
    return acc


def full(imgs):
    r = S._detect_batch(imgs, per_octave, n_octaves, upsample=False)
    return jnp.sum(r[2]) + jnp.sum(r[0])


fns = {"pyr": pyr, "topk": topk, "refine": refine, "patches": patches,
       "full": full}
fn = fns[stage]
t0 = time.perf_counter()
v = float(fn(imgs))
print(f"compile+run ok: {time.perf_counter()-t0:.1f}s val={v:.3g}", flush=True)
t0 = time.perf_counter()
for _ in range(3):
    v = float(fn(imgs))
dt = (time.perf_counter() - t0) / 3
print(f"steady: {dt*1000:.1f} ms ({dt/B*1000:.1f} ms/img) OK", flush=True)
