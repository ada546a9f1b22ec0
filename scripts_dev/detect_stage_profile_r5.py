"""Per-stage attribution of the TPU SIFT detector at mission shape
(VERDICT r4 next #5: detect 0.116 s/img, target <= 0.08; batching policy
is exhausted, so find which stage of features/sift_tpu.py's device graph
— or which host-side slice — to attack).

Times, at the production mission shape (2176x1440 scaled 0.4 -> 870x576,
B=2, upsample=True):

  e2e     full detect_dispatch -> finalize (the production call)
  haul    H2D upload of the uint8 batch + D2H of the packed result
  stage   octave-0 (the dominant one) component walls, jitted separately:
          blur pyramid (octave stack), extrema mask + approx_max_k,
          refine, patch extract+grads, orientation, descriptors, pack
  host    jpg decode + CLAHE-free resize path (load_scaled_gray) on a
          real-size synthetic jpg

Timing uses the chained-scalar protocol (block_until_ready returns early
on this tunneled runtime): fold a scalar through and fetch it.

Usage: python scripts_dev/detect_stage_profile_r5.py [--reps 8]
"""

import argparse
import math
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

import imageanalysis_tpu  # noqa: F401, E402
from imageanalysis_tpu.features import sift_tpu as st  # noqa: E402


def chain_time(fn, args, reps, name):
    """Median wall of reps calls, chained-scalar synced."""
    outs = fn(*args)
    s = sum(jnp.sum(jnp.asarray(o, jnp.float32).ravel()[:64])
            for o in jax.tree_util.tree_leaves(outs))
    float(s)  # compile + warm
    walls = []
    for _ in range(reps):
        t0 = time.perf_counter()
        outs = fn(*args)
        s = sum(jnp.sum(jnp.asarray(o, jnp.float32).ravel()[:64])
                for o in jax.tree_util.tree_leaves(outs))
        float(s)
        walls.append(time.perf_counter() - t0)
    w = float(np.median(walls))
    print(f"{name:34s} {w*1e3:8.1f} ms", flush=True)
    return w


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=8)
    ap.add_argument("--h", type=int, default=576)
    ap.add_argument("--w", type=int, default=870)
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--max-features", type=int, default=4096)
    args = ap.parse_args(argv)

    rng = np.random.default_rng(0)
    B, H, W = args.batch, args.h, args.w
    print(f"backend={jax.default_backend()} B={B} {W}x{H}", flush=True)

    gray = rng.integers(0, 255, (B, H, W)).astype(np.uint8)

    # --- end to end (production path) ------------------------------------
    def e2e():
        dev = jax.device_put(gray)
        packed = st.detect_dispatch(dev, args.max_features, upsample=True)
        return st.detect_finalize_batch(packed)

    # warm
    r = e2e()
    n_kp = sum(len(k[0]) for k in r) / B
    walls = []
    for _ in range(args.reps):
        t0 = time.perf_counter()
        e2e()
        walls.append(time.perf_counter() - t0)
    print(f"{'e2e dispatch+finalize':34s} {np.median(walls)*1e3:8.1f} ms "
          f"({n_kp:.0f} kp/img)", flush=True)

    # --- pure haul: upload + packed download -----------------------------
    dev = jax.device_put(gray)
    packed = st.detect_dispatch(dev, args.max_features, upsample=True)
    np.asarray(packed)
    walls_u, walls_d = [], []
    for _ in range(args.reps):
        t0 = time.perf_counter()
        d = jax.device_put(gray)
        float(jnp.sum(d[:, ::191, ::191].astype(jnp.float32)))
        walls_u.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        np.asarray(packed)
        walls_d.append(time.perf_counter() - t0)
    print(f"{'upload uint8 batch':34s} {np.median(walls_u)*1e3:8.1f} ms")
    print(f"{'download packed result':34s} {np.median(walls_d)*1e3:8.1f} ms "
          f"({packed.nbytes/1e6:.1f} MB)", flush=True)

    # --- stage walls at octave 0 (the dominant octave) -------------------
    imgs = jnp.asarray(gray).astype(jnp.float32) / 255.0
    Hb, Wb = H * 2, W * 2
    base = jax.jit(lambda x: jax.image.resize(x, (B, Hb, Wb), "linear"))
    base_img = base(imgs)
    sig_init = math.sqrt(max(st.SIGMA0 ** 2 - 1.0, 0.01))
    chain_time(jax.jit(lambda x: jax.image.resize(
        x, (B, Hb, Wb), "linear")), (imgs,), args.reps, "2x upsample")
    oct_img = jax.jit(lambda x: st._blur(x, sig_init))(base_img)
    chain_time(jax.jit(lambda x: st._blur(x, sig_init)), (base_img,),
               args.reps, "initial blur")

    stack = jax.jit(lambda x: st._octave_stack(x, st.SIGMA0))
    gs, dogs = stack(oct_img)
    chain_time(stack, (oct_img,), args.reps, "octave stack (5 blurs + dogs)")

    n_oct = max(int(math.log2(min(Hb, Wb) / 32.0)), 1)
    per_octave = max(args.max_features // n_oct, 64)
    per_level = max(per_octave // st.N_SCALES, 32)
    thresh = 0.5 * st.CONTRAST_THRESH / st.N_SCALES

    def extrema(dogs):
        outs = []
        for lvl in range(1, st.N_SCALES + 1):
            mask = st._extrema_mask_level(dogs, lvl, thresh)
            score = jnp.where(mask, jnp.abs(dogs[lvl]), 0.0).reshape(B, -1)
            vals, flat = jax.lax.approx_max_k(score, per_level,
                                              recall_target=0.95)
            outs.append((vals, flat))
        return outs

    ex = jax.jit(extrema)(dogs)
    chain_time(jax.jit(extrema), (dogs,), args.reps,
               f"extrema+topk x{st.N_SCALES} lvls")

    vals, flat = ex[1]
    Wd = dogs[1].shape[-1]
    y_idx = (flat // Wd).astype(jnp.int32)
    x_idx = (flat % Wd).astype(jnp.int32)
    v = vals > 0

    def refine_stage(dm, dc, dp, y, x, vv):
        def per_image(dmi, dci, dpi, yi, xi, vi):
            def one(yy, xx, vb):
                ds, dy, dx, c, e, yc, xc = st._refine((dmi, dci, dpi),
                                                      yy, xx)
                return dy, dx, c, vb & e
            return jax.vmap(one)(yi, xi, vi)
        return jax.vmap(per_image)(dm, dc, dp, y, x, vv)

    chain_time(jax.jit(refine_stage),
               (dogs[0], dogs[1], dogs[2], y_idx, x_idx, v),
               args.reps, "subpixel refine")

    def patch_stage(g, y, x):
        patches, y0, x0 = jax.vmap(
            lambda gg, yy, xx: st._extract_patches(gg, yy, xx))(g, y, x)
        N = B * y.shape[1]
        Hs, Ws = g.shape[1:]
        return st._patch_grads(patches.reshape(N, st.PATCH, st.PATCH),
                               y0.reshape(N), x0.reshape(N),
                               y.reshape(N), x.reshape(N), Hs, Ws)

    pg = jax.jit(patch_stage)(gs[1], y_idx, x_idx)
    chain_time(jax.jit(patch_stage), (gs[1], y_idx, x_idx), args.reps,
               "patch extract + grads")

    mag, ang, di, dj = pg
    N = mag.shape[0]
    sig = jnp.full((N,), st.SIGMA0, jnp.float32)

    def ori_stage(mag, ang, di, dj, sig):
        hist = st._orientation_hist(mag, ang, di, dj, sig)
        return st._orientation_peaks(hist)

    ori = jax.jit(ori_stage)(mag, ang, di, dj, sig)
    chain_time(jax.jit(ori_stage), (mag, ang, di, dj, sig), args.reps,
               "orientation hist+peaks")

    angles = ori[0]

    def desc_stage(mag, ang, di, dj, angles, sig):
        mag2 = jnp.concatenate([mag, mag], 0)
        ang2 = jnp.concatenate([ang, ang], 0)
        di2 = jnp.concatenate([di, di], 0)
        dj2 = jnp.concatenate([dj, dj], 0)
        a2 = jnp.concatenate([angles[:, 0], angles[:, 1]], 0)
        s2 = jnp.concatenate([sig, sig], 0)
        return st._descriptors_dense(mag2, ang2, di2, dj2, a2, s2)

    chain_time(jax.jit(desc_stage), (mag, ang, di, dj, angles, sig),
               args.reps, "descriptors (2 ori slots)")

    print("NOTE: stage walls are octave 0 / level 1 only; the full graph "
          "runs N_SCALES levels x n_octaves (area /4 per octave; "
          "candidate stages constant per level). e2e is the ground truth.",
          flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
