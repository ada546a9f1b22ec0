#!/usr/bin/env python
"""Locate the pipeline-matcher overhead: time each phase of the store path
on a real mission dir (defaults to /tmp/mission1000, kept by the bench).

The standalone bench does ~1450 pairs/s; the pipeline loop measured ~36.
Phases timed per chunk: store gather, device match, result download,
python unpack, smart prior update.
"""
import sys
import time

import numpy as np

proj_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/mission1000"

import jax
import jax.numpy as jnp

from imageanalysis_tpu.io.project import ProjectMgr
from imageanalysis_tpu.match.matcher import (BatchMatcher, MatchConfig,
                                             match_pair_batch_packed,
                                             _store_unpack)
from imageanalysis_tpu.match import worklist

proj = ProjectMgr(proj_dir)
proj.load_images_info()
poses = np.asarray([im.get_camera_pose()[0] for im in proj.image_list])
work = worklist.build_work_list(poses)
pairs = [(i, j) for _, i, j in work]
print(f"{len(proj.image_list)} images, {len(pairs)} pairs")

cfg = MatchConfig(batch_size=32)
t0 = time.time()
matcher = BatchMatcher(proj, cfg)
print(f"BatchMatcher init (store build): {time.time()-t0:.1f}s "
      f"store={'yes' if matcher.store else 'no'}")

B = 64
chunk = pairs[:B]
for trial in range(3):
    t = {}
    tt = time.time()
    ii = np.zeros(B, np.int32)
    jj = np.zeros(B, np.int32)
    for bi, (i, j) in enumerate(chunk):
        ii[bi], jj[bi] = i, j
    desc_a, uv_a, n_a = matcher.store.gather(ii)
    desc_b, uv_b, n_b = matcher.store.gather(jj)
    n_a.block_until_ready()
    t["gather"] = time.time() - tt

    tt = time.time()
    matcher.key, sub = jax.random.split(matcher.key)
    keys = jax.random.split(sub, B)
    bf16 = matcher.store.dtype == "uint8" or cfg.bf16
    packed = match_pair_batch_packed(
        desc_a, desc_b, uv_a, uv_b, n_a, n_b, keys, matcher.K,
        ratio=cfg.ratio, thresh=matcher.thresh,
        transform="homography", n_hyp=cfg.n_hyp,
        use_pallas=cfg.use_pallas, bf16=bf16)
    # force completion: download a dependent scalar
    _sync = int(jnp.sum((packed >= 0).astype(jnp.int32)))
    t["device_match"] = time.time() - tt

    tt = time.time()
    bj = np.asarray(packed)
    t["download"] = time.time() - tt
    print("   packed", bj.shape, bj.dtype)

    tt = time.time()
    n = _store_unpack(proj.image_list, chunk, bj, cfg.min_pairs)
    t["unpack"] = time.time() - tt

    tt = time.time()
    from imageanalysis_tpu.match import smart as smart_mod
    if "ss" not in dir():
        from imageanalysis_tpu.match.smart import SmartState
        ss = SmartState(proj.analysis_dir)
    smart_mod.update_pairs_batched(
        proj, ss, [(proj.image_list[i], proj.image_list[j])
                   for i, j in chunk])
    t["smart_update"] = time.time() - tt

    total = sum(t.values())
    print(f"trial {trial}: " + " ".join(f"{k}={v:.3f}s" for k, v in t.items())
          + f" total={total:.3f}s → {B/total:.1f} pairs/s")

# pipeline-shaped loop: 256-pair rounds (match + smart update), as in
# find_matches with batch_size=32
from imageanalysis_tpu.match import smart as smart_mod
from imageanalysis_tpu.match.smart import SmartState
ss2 = SmartState(proj.analysis_dir)
for r in range(3):
    sub = pairs[512 + r * 256: 512 + (r + 1) * 256]
    tt = time.time()
    n = matcher.match_pairs(sub, progress=False)
    t_match = time.time() - tt
    tt = time.time()
    smart_mod.update_pairs_batched(
        proj, ss2, [(proj.image_list[i], proj.image_list[j]) for i, j in sub])
    t_smart = time.time() - tt
    tot = t_match + t_smart
    print(f"round {r}: match={t_match:.2f}s smart={t_smart:.2f}s "
          f"→ {len(sub)/tot:.1f} pairs/s ({n} matches)")
