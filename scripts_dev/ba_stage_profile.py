"""BA inner-stage profile at mission scale, chained-sum protocol.

Builds a synthetic BA graph shaped like the 2812 mission (n_cam cams on a
grid, n_pt points, ~obs_per_pt observations each, chain-ordered so
pt_idx is sorted) and times: lm_jacobians / lm_solve (per PCG-iter count)
/ ba_cost. Identifies whether the ~25 s/iter at 4M obs is jacobians, PCG
obs-applies, or segment sums.

Usage: python scripts_dev/ba_stage_profile.py [n_cam] [n_pt]
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from imageanalysis_tpu.ba import bundle as B

n_cam = int(sys.argv[1]) if len(sys.argv) > 1 else 700
n_pt = int(sys.argv[2]) if len(sys.argv) > 2 else 250_000
obs_per_pt = 4

rng = np.random.default_rng(0)
# cameras on a grid at 100 m, nadir-ish
g = int(np.ceil(np.sqrt(n_cam)))
xy = np.stack(np.meshgrid(np.arange(g), np.arange(g)), -1).reshape(-1, 2)[:n_cam]
cams = np.zeros((n_cam, 7), np.float32)
cams[:, :2] = xy * 35.0
cams[:, 2] = -100.0
cams[:, 3] = 1.0  # identity quat
pts = np.zeros((n_pt, 3), np.float32)
pts[:, 0] = rng.uniform(0, g * 35.0, n_pt)
pts[:, 1] = rng.uniform(0, g * 35.0, n_pt)
pts[:, 2] = rng.normal(0, 1.0, n_pt)

# chain-major observations: each point seen by obs_per_pt nearby cams
pt_idx = np.repeat(np.arange(n_pt, dtype=np.int32), obs_per_pt)
near = (pts[:, :2] / 35.0).astype(np.int32)
base_cam = np.clip(near[:, 1] * g + near[:, 0], 0, n_cam - 1)
cam_idx = np.clip(base_cam[:, None] + np.array([0, 1, g, g + 1])[None, :],
                  0, n_cam - 1).astype(np.int32).reshape(-1)
K = np.array([[1400.0, 0, 1088], [0, 1400.0, 720], [0, 0, 1]], np.float32)
dist = np.zeros(5, np.float32)

# project to get consistent uv (+noise)
from imageanalysis_tpu.core.camera import project_points  # noqa: E402

try:
    uv = np.asarray(project_points(jnp.asarray(cams)[cam_idx],
                                   jnp.asarray(pts)[pt_idx],
                                   jnp.asarray(K), jnp.asarray(dist)))
except Exception:
    # fallback: pinhole by hand
    rel = pts[pt_idx] - cams[cam_idx, :3]
    uv = np.stack([K[0, 0] * rel[:, 0] / rel[:, 2] + K[0, 2],
                   K[1, 1] * rel[:, 1] / rel[:, 2] + K[1, 2]], -1)
uv = (uv + rng.normal(0, 0.5, uv.shape)).astype(np.float32)

obs = B.BAObservations(jnp.asarray(cam_idx), jnp.asarray(pt_idx),
                       jnp.asarray(uv), jnp.asarray(np.ones(len(uv), np.float32)))
cams_j = jnp.asarray(cams)
pts_j = jnp.asarray(pts)
Kj = jnp.asarray(K)
dj = jnp.asarray(dist)
print(f"n_cam={n_cam} n_pt={n_pt} n_obs={len(cam_idx)}")


def timeit(name, fn, reps=4):
    r = fn()
    jax.block_until_ready(r)
    # chained timing: dependent scalar
    t0 = time.perf_counter()
    for _ in range(reps):
        r = fn()
    s = jax.tree_util.tree_reduce(
        lambda a, x: a + jnp.sum(jnp.asarray(x, jnp.float32).ravel()[:1]),
        r, jnp.zeros((), jnp.float32))
    float(s)
    print(f"{name}: {(time.perf_counter()-t0)/reps*1000:.0f} ms")


timeit("ba_cost      ", lambda: B.ba_cost(cams_j, pts_j, obs, Kj, dj))
jac = B.lm_jacobians(cams_j, pts_j, obs, Kj, dj, n_cam, n_pt, pt_sorted=True)
jax.block_until_ready(jac)
timeit("lm_jacobians ", lambda: B.lm_jacobians(cams_j, pts_j, obs, Kj, dj,
                                               n_cam, n_pt, pt_sorted=True))
for cg in (10, 40):
    timeit(f"lm_solve cg={cg:2d}", lambda cg=cg: B.lm_solve(
        jac, obs.cam_idx, obs.pt_idx, jnp.float32(1e-3), cg_iters=cg,
        cg_tol=1e-3, pt_sorted=True))
