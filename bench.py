#!/usr/bin/env python
"""Headline benchmark: image pairs matched per second per chip.

Workload (BASELINE.md): the full per-pair match pipeline — exact 2-NN over
~6k 128-d SIFT-scale descriptor sets, Lowe ratio test, mutual cross-check,
homography-RANSAC geometric filter — the reference's Step 3a inner loop
(matcher.py:203-593), which dominates mission wall-clock.

Baseline: the reference's own stack (OpenCV FLANN knnMatch + ratio +
cross-check + cv2.findHomography RANSAC) timed on this host's CPU over the
same synthetic pairs. vs_baseline = ours / reference (higher is better).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import sys
import time

import numpy as np


N_FEAT = 6000          # realistic SIFT count at scale 0.4 on a 20 MP frame
N_PAD = 6144           # multiple of the pallas tile sizes (256/512)
DIM = 128
BATCH = 64
STEPS = 64
PLANTED = 1500         # correspondences per pair
CV_BASELINE_PAIRS = 2


def make_pair_batch(rng, batch):
    """SIFT-like pairs: descriptors are integer 0..255 (SIFT is natively
    uint8 — the mission DescriptorStore holds value−128 int8 and the match
    kernel runs on the int8 MXU with exact integer distances)."""
    # SIFT value statistics: gradient-histogram entries concentrate low
    # (the 0.2-norm clip caps entries near ~100 of 255)
    desc_a = rng.integers(0, 100, (batch, N_PAD, DIM)).astype(np.float32)
    desc_b = rng.integers(0, 100, (batch, N_PAD, DIM)).astype(np.float32)
    noise = rng.normal(0, 4, (batch, PLANTED, DIM))
    desc_b[:, :PLANTED] = np.clip(
        np.round(desc_a[:, :PLANTED] + noise), 0, 255)
    # padded rows mirror the store convention: constant 255 (far from any
    # real descriptor after the ratio test)
    desc_a[:, N_FEAT:] = 255.0
    desc_b[:, N_FEAT:] = 255.0
    uv_a = rng.uniform(0, 4000, (batch, N_PAD, 2)).astype(np.float32)
    H_scale = np.array([1.02, 0.98])
    uv_b = (uv_a * H_scale + np.array([25.0, -40.0])
            + rng.normal(0, 0.5, uv_a.shape)).astype(np.float32)
    return desc_a, desc_b, uv_a, uv_b


def bench_ours(steps=STEPS):
    import jax
    import jax.numpy as jnp

    from imageanalysis_tpu.match.matcher import match_pair_batch

    on_tpu = jax.default_backend() == "tpu"
    rng = np.random.default_rng(0)
    desc_a, desc_b, uv_a, uv_b = make_pair_batch(rng, BATCH)
    n_a = np.full(BATCH, N_FEAT, np.int32)
    n_b = np.full(BATCH, N_FEAT, np.int32)
    K = jnp.asarray(np.array([[3000.0, 0, 2000], [0, 3000.0, 1500],
                              [0, 0, 1]], np.float32))
    # the production mission path (match/store.py): descriptors live on
    # device as value−128 int8; the 2-NN kernel runs on the int8 MXU with
    # exact integer distances
    di8_a = (desc_a.astype(np.int16) - 128).astype(np.int8)
    di8_b = (desc_b.astype(np.int16) - 128).astype(np.int8)
    args = [jnp.asarray(x) for x in
            (di8_a, di8_b, uv_a, uv_b, n_a, n_b)]
    kwargs = dict(ratio=0.75, thresh=7.9, transform="homography", n_hyp=512,
                  use_pallas=on_tpu, bf16=True)

    # distinct input batches per step (defeats any backend-side caching of
    # identical executions) with pipelined dispatch (device queues execute
    # sequentially; enqueue-ahead matches real deployment). Variants are
    # derived ON DEVICE from the single uploaded batch — re-uploading
    # hundreds of MB per variant would measure the host link, not the chip.
    # Rolling descriptors + uv together relabels the keypoints without
    # changing pair geometry (and stays exact int8).
    @jax.jit
    def perturb(da, db, ua, ub, shift):
        return (jnp.roll(da, shift, axis=1), db,
                jnp.roll(ua, shift, axis=1), ub)

    variants = []
    for v in range(3):
        da2, db2, ua2, ub2 = perturb(args[0], args[1], args[2], args[3],
                                     101 * (v + 1))
        variants.append([da2, db2, ua2, ub2, args[4], args[5]])
    keys = jax.random.split(jax.random.PRNGKey(0), BATCH)

    def force(outs):
        # block_until_ready can return early over this runtime's remote
        # tunnel; downloading a scalar that depends on every output is the
        # only trustworthy sync
        return float(sum(jnp.sum(o[1]) for o in outs))

    # compile + warm up
    out = match_pair_batch(*args, keys, K, **kwargs)
    force([out])
    warm = [match_pair_batch(*v, keys, K, **kwargs) for v in variants]
    force(warm)
    t0 = time.perf_counter()
    outs = []
    for s in range(steps):
        keys = jax.random.split(jax.random.PRNGKey(s + 1), BATCH)
        outs.append(match_pair_batch(*variants[s % 3], keys, K, **kwargs))
    force(outs)
    dt = time.perf_counter() - t0
    n_matches = int(np.asarray(outs[-1][1]).sum())
    pairs_per_sec = BATCH * steps / dt
    return pairs_per_sec, n_matches / BATCH


def bench_reference_cpu():
    """The reference's per-pair pipeline with OpenCV, single-thread-ish CPU
    (reference matcher.py:43-80 FLANN config, :218-300 ratio+crosscheck,
    :122 findHomography RANSAC)."""
    try:
        import cv2
    except ImportError:
        return None
    rng = np.random.default_rng(0)
    desc_a, desc_b, uv_a, uv_b = make_pair_batch(rng, CV_BASELINE_PAIRS)
    FLANN_INDEX_KDTREE = 1
    index_params = dict(algorithm=FLANN_INDEX_KDTREE, trees=5)
    search_params = dict(checks=100)
    t0 = time.perf_counter()
    for b in range(CV_BASELINE_PAIRS):
        da = desc_a[b, :N_FEAT]
        db = desc_b[b, :N_FEAT]
        flann = cv2.FlannBasedMatcher(index_params, search_params)
        raw = flann.knnMatch(da, db, k=2)
        rev = flann.knnMatch(db, da, k=1)
        rev_best = {m[0].queryIdx: m[0].trainIdx for m in rev if m}
        src, dst = [], []
        for m_n in raw:
            if len(m_n) < 2:
                continue
            m, n = m_n
            if m.distance < 0.75 * n.distance and \
               rev_best.get(m.trainIdx) == m.queryIdx:
                src.append(uv_a[b, m.queryIdx])
                dst.append(uv_b[b, m.trainIdx])
        if len(src) >= 4:
            cv2.findHomography(np.asarray(src), np.asarray(dst), cv2.RANSAC, 7.9)
    dt = time.perf_counter() - t0
    return CV_BASELINE_PAIRS / dt


def main():
    pairs_per_sec, matches_per_pair = bench_ours()
    ref = bench_reference_cpu()
    vs = pairs_per_sec / ref if ref else None
    import jax
    result = {
        "metric": "image pairs matched/sec/chip (6k-feature SIFT pairs, "
                  "2-NN+ratio+crosscheck+homography-RANSAC)",
        "value": round(pairs_per_sec, 3),
        "unit": "pairs/s",
        "vs_baseline": round(vs, 2) if vs else None,
        "detail": {
            "backend": jax.default_backend(),
            "matches_per_pair": round(matches_per_pair, 1),
            "reference_cpu_pairs_per_sec": round(ref, 4) if ref else None,
            "n_features": N_FEAT,
            "batch": BATCH,
        },
    }
    # attach the measured mission-scale result (BASELINE.md target) if a
    # committed mission bench exists — benchmarks/mission_bench.py
    try:
        here = os.path.dirname(os.path.abspath(__file__))
        with open(os.path.join(here, "BENCH_mission_2812.json")) as f:
            m = json.load(f)
        result["detail"]["mission_2812"] = {
            "pipeline_total_s_1chip": m.get("pipeline_total_s"),
            "detect_match_ba_s_1chip": m.get("extrapolated_2812img_1chip_s"),
            "extrapolated_8chip_s": m.get("extrapolated_2812img_8chip_s"),
            "target_s": m.get("target_s"),
            "ba_mre_px": m.get("ba_mre_px"),
            "cam_pos_err_mean_m": m.get("cam_pos_err_mean_m"),
        }
    except (OSError, ValueError):
        pass
    print(json.dumps(result))


if __name__ == "__main__":
    main()
