"""Mission-scale BA wall-clock on a synthetic graph (no project dir needed).

Builds a 2812-camera / ~1.35M-point / ~4.06M-observation graph with the
same shape statistics as the 2812-image mission and times bundle.solve
twice (cold-or-cacheload, then warm) plus the phase split (trace vs
device) of one lm_jacobians/lm_solve pair.
"""

import json
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

from imageanalysis_tpu.ba import bundle

N_CAM = int(sys.argv[1]) if len(sys.argv) > 1 else 2812
OBS_PER_PT = 3
N_PT = 1_354_000 if N_CAM == 2812 else N_CAM * 480
N_OBS = N_PT * OBS_PER_PT

rng = np.random.default_rng(0)

# cameras on a lawnmower grid at 60 m AGL looking down
side = int(np.ceil(np.sqrt(N_CAM)))
gx, gy = np.meshgrid(np.arange(side), np.arange(side))
cam_ned = np.stack([gx.ravel()[:N_CAM] * 30.0, gy.ravel()[:N_CAM] * 30.0,
                    np.full(N_CAM, -60.0)], axis=1)
from imageanalysis_tpu.core.rotations import quat_from_ypr, quat_multiply
q_nadir = np.asarray(quat_multiply(quat_from_ypr(0.0, 0.0, 0.0),
                                   quat_from_ypr(0.0, np.deg2rad(-90.0), 0.0)))
quat = np.tile(q_nadir, (N_CAM, 1))
cams = np.concatenate([cam_ned, quat], axis=1).astype(np.float32)

# points on the ground near cameras; each seen by OBS_PER_PT nearby cams
pt_cam = rng.integers(0, N_CAM, N_PT)
pts = (cam_ned[pt_cam] * np.array([1, 1, 0])
       + rng.uniform(-40, 40, (N_PT, 3)) * np.array([1, 1, 0.2])).astype(np.float32)

cam_idx = np.empty(N_OBS, np.int32)
pt_idx = np.empty(N_OBS, np.int32)
for k in range(OBS_PER_PT):
    cam_idx[k::OBS_PER_PT] = np.clip(pt_cam + rng.integers(-2, 3, N_PT), 0, N_CAM - 1)
    pt_idx[k::OBS_PER_PT] = np.arange(N_PT)
order = np.argsort(pt_idx, kind="stable")
cam_idx, pt_idx = cam_idx[order], pt_idx[order]

K = np.array([[2000.0, 0, 1088], [0, 2000.0, 720], [0, 0, 1]], np.float32)
dist = np.zeros(5, np.float32)

from imageanalysis_tpu.core.camera import project_ned_quat
uv_clean, _ = project_ned_quat(jnp.asarray(pts)[pt_idx], jnp.asarray(cams)[cam_idx, :3],
                               jnp.asarray(cams)[cam_idx, 3:7], jnp.asarray(K),
                               jnp.asarray(dist))
uv = np.asarray(uv_clean) + rng.normal(0, 0.5, (N_OBS, 2)).astype(np.float32)
obs = bundle.BAObservations(jnp.asarray(cam_idx), jnp.asarray(pt_idx),
                            jnp.asarray(uv.astype(np.float32)),
                            jnp.ones(N_OBS, jnp.float32))

# perturb initial state
cams_n = cams + rng.normal(0, 1.0, cams.shape).astype(np.float32) * np.array(
    [1, 1, 1, 0.01, 0.01, 0.01, 0.01], np.float32)
pts_n = pts + rng.normal(0, 2.0, pts.shape).astype(np.float32)

print(f"graph: {N_CAM} cams, {N_PT} pts, {N_OBS} obs", flush=True)
for run in ("cold", "warm"):
    t0 = time.time()
    res = bundle.solve(jnp.asarray(cams_n), jnp.asarray(pts_n), obs, K, dist,
                       bundle.BAConfig(max_iters=10), verbose=True)
    dt = time.time() - t0
    print(json.dumps({"run": run, "ba_wall_s": round(dt, 1),
                      "iters": int(res.iters), "mre_px": round(float(res.mre), 4)}),
          flush=True)
