"""Diagnose the mission matching stall: phase timers around the store path."""
import time

import numpy as np
import jax
import jax.numpy as jnp

from imageanalysis_tpu.io.project import ProjectMgr
from imageanalysis_tpu.match import worklist
from imageanalysis_tpu.match.matcher import (BatchMatcher, MatchConfig,
                                             match_pair_batch, _store_unpack)

proj = ProjectMgr("/root/mission300/mission")
proj.load_images_info()
print("images:", len(proj.image_list), "backend:", jax.default_backend(),
      flush=True)

poses = []
for im in proj.image_list:
    ned, _, _ = im.get_camera_pose()
    poses.append(ned)
t0 = time.perf_counter()
work = worklist.build_work_list(np.asarray(poses))
print(f"worklist: {len(work)} pairs in {time.perf_counter()-t0:.1f}s",
      flush=True)

cfg = MatchConfig(batch_size=32)
t0 = time.perf_counter()
matcher = BatchMatcher(proj, cfg)
print(f"BatchMatcher init (store build): {time.perf_counter()-t0:.1f}s "
      f"store={'yes' if matcher.store else 'no'}", flush=True)

pairs = [(i, j) for _, i, j in work[:256]]
B = 64
key = jax.random.PRNGKey(0)
images = proj.image_list
for ci in range(3):
    chunk_pairs = pairs[ci * B:(ci + 1) * B]
    t_g0 = time.perf_counter()
    ii = np.zeros(B, np.int32)
    jj = np.zeros(B, np.int32)
    for bi, (i, j) in enumerate(chunk_pairs):
        ii[bi], jj[bi] = i, j
    da, ua, na = matcher.store.gather(ii)
    db, ub, nb = matcher.store.gather(jj)
    jax.block_until_ready(da)
    t_g = time.perf_counter() - t_g0

    t_d0 = time.perf_counter()
    key, sub = jax.random.split(key)
    keys = jax.random.split(sub, B)
    best_j, ok = match_pair_batch(
        da, db, ua, ub, na, nb, keys, matcher.K,
        ratio=cfg.ratio, thresh=matcher.thresh, transform="homography",
        n_hyp=cfg.n_hyp, use_pallas=True, bf16=True)
    t_d = time.perf_counter() - t_d0

    t_w0 = time.perf_counter()
    bj = np.asarray(best_j)
    okh = np.asarray(ok)
    t_w = time.perf_counter() - t_w0

    t_u0 = time.perf_counter()
    n = _store_unpack(images, chunk_pairs, bj, okh, cfg.min_pairs)
    t_u = time.perf_counter() - t_u0
    print(f"chunk {ci}: gather={t_g:.2f}s dispatch={t_d:.2f}s "
          f"download+wait={t_w:.2f}s unpack={t_u:.2f}s matches={n}",
          flush=True)

# and one save pass
t0 = time.perf_counter()
dirty = [im for im in images if not im.matches_clean]
for im in dirty:
    im.save_matches()
print(f"save {len(dirty)} match caches: {time.perf_counter()-t0:.1f}s",
      flush=True)
