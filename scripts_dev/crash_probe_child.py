"""One crash-bisect probe, run as a subprocess of crash_bisect.py.

argv[1] is a JSON config: {"H","W","B","stage","upsample","blur",
"n_octaves"}. stage selects how much of the detect path runs:

  resize   - just the 2x linear upsample
  blur1    - upsample + the initial sigma blur
  pyramid  - upsample + blur + full octave stacks + downsamples
  extrema  - pyramid + extrema masks + approx_max_k
  full     - detect_and_compute_batch (the production path)

Prints "CHILD_OK <stage> <seconds>" and exits 0 on success; a TPU-worker
wedge makes this process hang (the driver kills it on timeout).
"""

import json
import math
import sys
import time

import numpy as np


def main():
    cfg = json.loads(sys.argv[1])
    import jax
    import jax.numpy as jnp
    from imageanalysis_tpu.features import sift_tpu

    sift_tpu.BLUR_IMPL = cfg.get("blur", "auto")
    H, W, B = cfg["H"], cfg["W"], cfg["B"]
    ups = cfg.get("upsample", True)
    stage = cfg["stage"]
    rng = np.random.default_rng(0)
    imgs = (rng.random((B, H, W)) * 255).astype(np.uint8)

    t0 = time.perf_counter()
    if stage == "full":
        kp, meta, desc, valid = sift_tpu.detect_and_compute_batch(
            imgs, 4096, max_chunk=B, upsample=ups)
        t_compile = time.perf_counter() - t0
        # warm pass for an honest per-image rate
        imgs2 = (rng.random((B, H, W)) * 255).astype(np.uint8)
        t1 = time.perf_counter()
        kp, meta, desc, valid = sift_tpu.detect_and_compute_batch(
            imgs2, 4096, max_chunk=B, upsample=ups)
        warm = time.perf_counter() - t1
        print(f"CHILD_OK full {t_compile:.1f}s warm={warm:.3f}s "
              f"({warm / B * 1000:.0f} ms/img) kp={int(valid.sum())}",
              flush=True)
        return
    else:
        base_min = min(H, W) * (2 if ups else 1)
        n_oct = cfg.get("n_octaves") or max(
            int(math.log2(base_min / 32.0)), 1)

        @jax.jit
        def run(x):
            x = x.astype(jnp.float32) / 255.0
            if ups:
                Bs, Hs, Ws = x.shape
                x = jax.image.resize(x, (Bs, Hs * 2, Ws * 2), "linear")
            if stage == "resize":
                return jnp.sum(jnp.abs(x))
            sig_init = math.sqrt(max(
                sift_tpu.SIGMA0 ** 2 - (1.0 if ups else 0.25), 0.01))
            img = sift_tpu._blur(x, sig_init)
            if stage == "blur1":
                return jnp.sum(jnp.abs(img))
            acc = jnp.float32(0.0)
            thresh = 0.5 * sift_tpu.CONTRAST_THRESH / sift_tpu.N_SCALES
            for _o in range(n_oct):
                gs, dogs = sift_tpu._octave_stack(img, sift_tpu.SIGMA0)
                if stage == "extrema":
                    for lvl in range(1, sift_tpu.N_SCALES + 1):
                        mask = sift_tpu._extrema_mask_level(
                            dogs, lvl, thresh)
                        score = jnp.where(mask, jnp.abs(dogs[lvl]),
                                          0.0).reshape(x.shape[0], -1)
                        vals, flat = jax.lax.approx_max_k(
                            score, 512, recall_target=0.95)
                        acc = acc + jnp.sum(vals)
                else:
                    acc = acc + jnp.sum(jnp.abs(dogs[-1]))
                img = sift_tpu._downsample2(gs[sift_tpu.N_SCALES])
            return acc

        extra = float(run(jnp.asarray(imgs)))
    dt = time.perf_counter() - t0
    print(f"CHILD_OK {stage} {dt:.1f}s extra={extra}", flush=True)


if __name__ == "__main__":
    main()
