"""Warm-cache BA wall-clock on the full 2812-image mission graph.

The mission-bench ba_s includes the one-time XLA compile of the split
lm_jacobians/lm_solve graphs (fresh after the r3 refactor); this re-runs
the same solve twice against the same observation graph — the second
number is the honest steady-state BA wall (compiles cached)."""

import json
import sys
import time

import numpy as np

proj_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/mission2812c"

from imageanalysis_tpu.ba import bundle, setup as ba_setup
from imageanalysis_tpu.io.project import ProjectMgr
from imageanalysis_tpu.match import groups as groups_mod

proj = ProjectMgr(proj_dir)
proj.load_images_info()
matches = proj.load_matches_grouped()
grps = groups_mod.load(proj.analysis_dir)
cams0, pts0, obs, cam_names, match_map = ba_setup.setup_from_matches(
    proj, matches, group_images=grps[0] if grps else None, min_chain_len=2)
model = proj.camera_model()
print(f"graph: {len(cam_names)} cams, {len(pts0)} pts, "
      f"{int(np.asarray(obs.weight).sum())} obs", flush=True)

for run in ("cold(or cache-load)", "warm"):
    t0 = time.time()
    res = bundle.solve(cams0, pts0, obs, model.K, model.dist,
                       bundle.BAConfig(), verbose=False)
    dt = time.time() - t0
    print(json.dumps({"run": run, "ba_wall_s": round(dt, 1),
                      "iters": res.iters, "mre_px": round(res.mre, 4)}),
          flush=True)
