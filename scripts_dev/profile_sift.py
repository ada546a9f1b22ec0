"""Profile the SIFT detector stage-by-stage on the real TPU at ~3 MP.

Dev tool (not shipped): measures where detector time goes to guide the
Pallas kernel work. Run: python scripts_dev/profile_sift.py
"""
import math
import time

import jax
import jax.numpy as jnp
import numpy as np

from imageanalysis_tpu.features import sift_tpu as S

H, W = 1440, 2176
B = 4
rng = np.random.default_rng(0)
imgs_np = (rng.uniform(0, 255, (B, H, W))).astype(np.float32)
imgs = jnp.asarray(imgs_np) / 255.0

n_octaves = max(int(math.log2(min(H, W) / 32.0)), 1)
per_octave = max(4096 // n_octaves, 64)
per_level = max(per_octave // S.N_SCALES, 32)
thresh = 0.5 * S.CONTRAST_THRESH / S.N_SCALES


def timeit(name, fn, *args, n=3):
    out = fn(*args)
    jax.tree_util.tree_map(
        lambda x: x.block_until_ready() if hasattr(x, "block_until_ready") else x, out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
        jax.tree_util.tree_map(
            lambda x: x.block_until_ready() if hasattr(x, "block_until_ready") else x, out)
    dt = (time.perf_counter() - t0) / n
    print(f"{name:40s} {dt*1000:9.2f} ms  ({dt/B*1000:7.2f} ms/img)", flush=True)
    return out


# --- stage 1: pyramid (blur + octave stacks, all octaves) -----------------
@jax.jit
def pyramid_only(imgs):
    base = S._blur(imgs, S.SIGMA0)
    outs = []
    img = base
    for o in range(n_octaves):
        gs, dogs = S._octave_stack(img, S.SIGMA0)
        outs.append(dogs[1])
        img = gs[S.N_SCALES][:, ::2, ::2]
    return outs

# --- stage 2: pyramid + extrema masks --------------------------------------
@jax.jit
def pyr_extrema(imgs):
    base = S._blur(imgs, S.SIGMA0)
    outs = []
    img = base
    for o in range(n_octaves):
        gs, dogs = S._octave_stack(img, S.SIGMA0)
        for lvl in range(1, S.N_SCALES + 1):
            outs.append(S._extrema_mask_level(dogs, lvl, thresh).sum())
        img = gs[S.N_SCALES][:, ::2, ::2]
    return outs

# --- stage 3: + approx_max_k ------------------------------------------------
@jax.jit
def pyr_extrema_topk(imgs):
    base = S._blur(imgs, S.SIGMA0)
    outs = []
    img = base
    for o in range(n_octaves):
        gs, dogs = S._octave_stack(img, S.SIGMA0)
        Bq, Hq, Wq = gs[0].shape
        for lvl in range(1, S.N_SCALES + 1):
            mask = S._extrema_mask_level(dogs, lvl, thresh)
            score = jnp.where(mask, jnp.abs(dogs[lvl]), 0.0).reshape(Bq, -1)
            vals, flat = jax.lax.approx_max_k(score, per_level, recall_target=0.95)
            outs.append((vals, flat))
        img = gs[S.N_SCALES][:, ::2, ::2]
    return outs

# --- full detect ------------------------------------------------------------
def full(imgs):
    return S._detect_batch(imgs, per_octave, n_octaves)


print(f"B={B} {H}x{W}, n_octaves={n_octaves}, per_octave={per_octave}", flush=True)
print("backend:", jax.default_backend(), flush=True)
timeit("pyramid only", pyramid_only, imgs)
timeit("pyramid + extrema masks", pyr_extrema, imgs)
timeit("pyramid + extrema + approx_max_k", pyr_extrema_topk, imgs)
timeit("full _detect_batch", full, imgs)
