"""Bisect _detect_batch's device cost at mission resolution (2176x1440,
upsample -> 4352x2880 base): pyramid -> extrema+topk -> refine ->
patches -> hist/ori -> desc -> pack. Chained-sum protocol."""

import math
import time
import sys

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from imageanalysis_tpu.features import sift_tpu as S

H, W = 1440, 2176
N = 8
import cv2
rng = np.random.default_rng(0)
base = cv2.GaussianBlur(rng.integers(0, 255, (H, W)).astype(np.float32),
                        (0, 0), 2.0).astype(np.uint8)
frames = [jnp.asarray(np.clip(base.astype(np.int16)
                              + rng.integers(-8, 8, (H, W)), 0,
                              255).astype(np.uint8)) for _ in range(2)]

MAXF = 4096
base_min = min(H, W) * 2
n_octaves = max(int(math.log2(base_min / 32.0)), 1)
per_octave = max(MAXF // n_octaves, 64)
per_level = max(per_octave // S.N_SCALES, 32)
print(f"n_octaves={n_octaves} per_level={per_level}")


def make(stage):
    @jax.jit
    def run(img, salt):
        imgs = img[None].astype(jnp.float32) / 255.0
        B = 1
        thresh = 0.5 * S.CONTRAST_THRESH / S.N_SCALES
        Hb, Wb = imgs.shape[1] * 2, imgs.shape[2] * 2
        bas = jax.image.resize(imgs, (B, Hb, Wb), "linear")
        sig_init = math.sqrt(max(S.SIGMA0**2 - 1.0, 0.01))
        acc = jnp.zeros((), jnp.float32)
        octave_img = S._blur(bas, sig_init)
        for o in range(n_octaves):
            gs, dogs = S._octave_stack(octave_img, S.SIGMA0)
            B_, Ho, Wo = gs[0].shape
            if stage == "pyramid":
                acc = acc + jnp.sum(dogs[1]) * 1e-6
                octave_img = S._downsample2(gs[S.N_SCALES])
                continue
            for lvl in range(1, S.N_SCALES + 1):
                mask = S._extrema_mask_level(dogs, lvl, thresh)
                score = jnp.where(mask, jnp.abs(dogs[lvl]), 0.0).reshape(B, -1)
                vals, flat = jax.lax.approx_max_k(score, per_level,
                                                  recall_target=0.95)
                if stage == "topk":
                    acc = acc + jnp.sum(vals) + jnp.sum(flat) * 1e-9
                    continue
                y_idx = (flat // Wo).astype(jnp.int32)
                x_idx = (flat % Wo).astype(jnp.int32)
                cand_valid = vals > 0
                dog3 = (dogs[lvl - 1], dogs[lvl], dogs[lvl + 1])

                def per_image(dm, dc, dp, y_i, x_i, v_i, lvl=lvl):
                    def one(y, x, v):
                        ds, dy, dx, c, e, _yc, _xc = S._refine((dm, dc, dp), y, x)
                        ok = v & e & (jnp.abs(c) > S.CONTRAST_THRESH / S.N_SCALES)
                        sigma = S.SIGMA0 * (2.0 ** ((lvl - 1 + ds) / S.N_SCALES))
                        return dy, dx, sigma, c, ok
                    return jax.vmap(one)(y_i, x_i, v_i)

                dy, dx, sigma, contrast, ok = jax.vmap(per_image)(
                    dog3[0], dog3[1], dog3[2], y_idx, x_idx, cand_valid)
                if stage == "refine":
                    acc = acc + jnp.sum(sigma) + jnp.sum(dy)
                    continue
                patches, y0, x0 = jax.vmap(
                    lambda g, y, x: S._extract_patches(g, y, x))(
                    gs[lvl], y_idx, x_idx)
                if stage == "patches":
                    acc = acc + jnp.sum(patches) * 1e-6
                    continue
                Np = B_ * y_idx.shape[1]
                mag, ang, di, dj = S._patch_grads(
                    patches.reshape(Np, S.PATCH, S.PATCH), y0.reshape(Np),
                    x0.reshape(Np), y_idx.reshape(Np), x_idx.reshape(Np),
                    Ho, Wo)
                sig_f = sigma.reshape(Np)
                hist = S._orientation_hist(mag, ang, di, dj, sig_f)
                angles, ori_valid = S._orientation_peaks(hist)
                if stage == "hist":
                    acc = acc + jnp.sum(hist) * 1e-6 + jnp.sum(angles)
                    continue
                mag2 = jnp.concatenate([mag, mag], 0)
                ang2 = jnp.concatenate([ang, ang], 0)
                di2 = jnp.concatenate([di, di], 0)
                dj2 = jnp.concatenate([dj, dj], 0)
                ang_slots = jnp.concatenate([angles[:, 0], angles[:, 1]], 0)
                sig2 = jnp.concatenate([sig_f, sig_f], 0)
                desc2 = S._descriptors_dense(mag2, ang2, di2, dj2,
                                             ang_slots, sig2)
                acc = acc + jnp.sum(desc2.astype(jnp.float32)) * 1e-6
            octave_img = S._downsample2(gs[S.N_SCALES])
        return acc * 0 + salt
    return run


for st in ("pyramid", "topk", "refine", "patches", "hist", "desc"):
    fn = make(st)
    acc = fn(frames[0], 0)
    float(acc)
    acc = jnp.zeros((), jnp.float32)
    for s in range(2):
        acc = acc + fn(frames[s % 2], s)
    float(acc)
    t0 = time.perf_counter()
    acc = jnp.zeros((), jnp.float32)
    for s in range(N):
        acc = acc + fn(frames[s % 2], s)
    float(acc)
    dt = time.perf_counter() - t0
    print(f"{st:8s}: {dt/N*1000:.1f} ms/img")
