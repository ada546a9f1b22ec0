"""Phase split of one warm LM iteration at mission scale: lm_jacobians vs
lm_solve vs ba_cost, with honest chained-scalar syncing (enqueue K reps,
download one dependent scalar)."""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from imageanalysis_tpu.ba import bundle

N_CAM = int(sys.argv[1]) if len(sys.argv) > 1 else 2812
N_PT = 1_354_000 if N_CAM == 2812 else N_CAM * 480
OBS_PER_PT = 3
N_OBS = N_PT * OBS_PER_PT

rng = np.random.default_rng(0)
side = int(np.ceil(np.sqrt(N_CAM)))
gx, gy = np.meshgrid(np.arange(side), np.arange(side))
cam_ned = np.stack([gx.ravel()[:N_CAM] * 30.0, gy.ravel()[:N_CAM] * 30.0,
                    np.full(N_CAM, -60.0)], axis=1)
from imageanalysis_tpu.core.rotations import quat_from_ypr, quat_multiply
q_nadir = np.asarray(quat_multiply(quat_from_ypr(0.0, 0.0, 0.0),
                                   quat_from_ypr(0.0, np.deg2rad(-90.0), 0.0)))
cams = np.concatenate([cam_ned, np.tile(q_nadir, (N_CAM, 1))],
                      axis=1).astype(np.float32)
pt_cam = rng.integers(0, N_CAM, N_PT)
pts = (cam_ned[pt_cam] * np.array([1, 1, 0])
       + rng.uniform(-30, 30, (N_PT, 3)) * np.array([1, 1, 0.1])).astype(np.float32)
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
uv, _ = project_ned_quat(jnp.asarray(pts)[pt_idx], jnp.asarray(cams)[cam_idx, :3],
                         jnp.asarray(cams)[cam_idx, 3:7], jnp.asarray(K),
                         jnp.asarray(dist))
uv = jnp.asarray(np.asarray(uv) + rng.normal(0, 0.5, (N_OBS, 2)).astype(np.float32))
obs = bundle.BAObservations(jnp.asarray(cam_idx), jnp.asarray(pt_idx), uv,
                            jnp.ones(N_OBS, jnp.float32))
cams_j = jnp.asarray(cams)
pts_j = jnp.asarray(pts + rng.normal(0, 0.3, pts.shape).astype(np.float32))

lam = jnp.float32(1e-3)
REPS = 3

def sync(x):
    return float(jnp.asarray(x).ravel()[0])

# warm everything once
jac = bundle.lm_jacobians(cams_j, pts_j, obs, K, dist, N_CAM, N_PT, pt_sorted=True)
dc, dp, pd = bundle.lm_solve(jac, obs.cam_idx, obs.pt_idx, lam,
                             cg_iters=40, cg_tol=1e-3, pt_sorted=True)
c = bundle.ba_cost(cams_j, pts_j, obs, K, dist)
sync(dc); sync(c[0]); sync(jac[3])

t0 = time.perf_counter()
acc = None
for _ in range(REPS):
    jac = bundle.lm_jacobians(cams_j, pts_j, obs, K, dist, N_CAM, N_PT,
                              pt_sorted=True)
    acc = jac[3] if acc is None else acc + jac[3]
sync(acc)
t_jac = (time.perf_counter() - t0) / REPS

t0 = time.perf_counter()
acc = None
for i in range(REPS):
    dc, dp, pd = bundle.lm_solve(jac, obs.cam_idx, obs.pt_idx,
                                 lam * (1.0 + i), cg_iters=40, cg_tol=1e-3,
                                 pt_sorted=True)
    acc = dc if acc is None else acc + dc
sync(acc)
t_solve = (time.perf_counter() - t0) / REPS

t0 = time.perf_counter()
acc = None
for i in range(REPS):
    c = bundle.ba_cost(cams_j + 1e-6 * i, pts_j, obs, K, dist)
    acc = c[0] if acc is None else acc + c[0]
sync(acc)
t_cost = (time.perf_counter() - t0) / REPS

print(f"n_obs={N_OBS}: lm_jacobians {t_jac:.2f}s  lm_solve(40cg) {t_solve:.2f}s"
      f"  ba_cost {t_cost:.2f}s", flush=True)
