"""f32-vs-f64 BA conditioning oracle (VERDICT r2 weak #4).

The production TPU solve runs f32 with 1e-20 determinant floors in the
closed-form 3×3 point-block inverses (ba/bundle.py). This script solves the
SAME ≥300-camera synthetic mission graph in f32 and f64 on CPU and reports
the deltas — bounding the f32 conditioning error with a measurement instead
of trust.

Run:  JAX_ENABLE_X64=1 python scripts_dev/ba_f64_oracle.py [n_cam]
Prints one JSON line; tests/test_ba.py::test_ba_f32_matches_f64_oracle
asserts the documented bound (mre delta < 0.01 px).
"""

import json
import os
import sys

os.environ.setdefault("JAX_ENABLE_X64", "1")
os.environ["JAX_PLATFORM_NAME"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np

from imageanalysis_tpu.ba import bundle
from imageanalysis_tpu.core import camera as cam
from imageanalysis_tpu.core import rotations as rot

K = np.array([[1800.0, 0, 960.0], [0, 1800.0, 720.0], [0, 0, 1.0]])
DIST = np.zeros(5)


def synth_problem_vec(rng, n_cam=300, n_pt=6000, obs_per_pt=4, px_noise=0.3):
    """Vectorized aerial-grid mission (the per-point python loop of the
    test-suite generator is too slow at 300 cams on one core)."""
    side = int(np.ceil(np.sqrt(n_cam)))
    gx, gy = np.divmod(np.arange(n_cam), side)
    ned = np.c_[gx * 40.0, gy * 40.0,
                -120.0 + rng.normal(0, 2, n_cam)]
    quats = np.stack([np.asarray(rot.quat_from_ypr(
        rng.normal(0, 0.2), np.radians(-88) + rng.normal(0, 0.03),
        rng.normal(0, 0.03))) for _ in range(n_cam)])
    cams_true = np.c_[ned, quats]

    span = side * 40.0
    pts_true = np.c_[rng.uniform(-30, span + 30, (n_pt, 2)),
                     rng.uniform(-8, 8, (n_pt, 1))]

    # each point observed by its obs_per_pt nearest cameras (vectorized)
    d = np.linalg.norm(ned[None, :, :2] - pts_true[:, None, :2], axis=2)
    near = np.argsort(d, axis=1)[:, :obs_per_pt]
    pt_idx = np.repeat(np.arange(n_pt), obs_per_pt)
    cam_idx = near.ravel()
    pred, z = cam.project_ned_quat(jnp.asarray(pts_true[pt_idx]),
                                   jnp.asarray(cams_true[cam_idx, :3]),
                                   jnp.asarray(cams_true[cam_idx, 3:7]),
                                   jnp.asarray(K), jnp.asarray(DIST))
    pred = np.asarray(pred)
    z = np.asarray(z)
    keep = (z > 0) & (pred[:, 0] >= 0) & (pred[:, 0] < 1920) \
        & (pred[:, 1] >= 0) & (pred[:, 1] < 1440)
    uv = pred[keep] + rng.normal(0, px_noise, (int(keep.sum()), 2))
    obs = bundle.BAObservations(
        cam_idx=jnp.asarray(cam_idx[keep].astype(np.int32)),
        pt_idx=jnp.asarray(pt_idx[keep].astype(np.int32)),
        uv=jnp.asarray(uv),
        weight=jnp.ones(int(keep.sum())))

    cams0 = cams_true.copy()
    cams0[:, :3] += rng.normal(0, 1.5, (n_cam, 3))
    dq = np.stack([np.asarray(rot.quat_from_ypr(*rng.normal(0, 0.01, 3)))
                   for _ in range(n_cam)])
    for c in range(n_cam):
        cams0[c, 3:7] = np.asarray(rot.quat_multiply(cams0[c, 3:7], dq[c]))
    pts0 = pts_true + rng.normal(0, 3.0, pts_true.shape)
    return cams_true, pts_true, cams0, pts0, obs


def main():
    n_cam = int(sys.argv[1]) if len(sys.argv) > 1 else 300
    rng = np.random.default_rng(1)
    cams_true, pts_true, cams0, pts0, obs = synth_problem_vec(rng, n_cam)
    cfg = bundle.BAConfig(max_iters=40, ftol=1e-6)
    Kj, Dj = jnp.asarray(K), jnp.asarray(DIST)

    r32 = bundle.solve(cams0, pts0, obs, Kj.astype(jnp.float32),
                       Dj.astype(jnp.float32), cfg, verbose=False,
                       dtype=jnp.float32)
    r64 = bundle.solve(cams0, pts0, obs, Kj, Dj, cfg, verbose=False,
                       dtype=jnp.float64)

    cam_delta = np.linalg.norm(r32.cams[:, :3] - r64.cams[:, :3], axis=1)
    pt_delta = np.linalg.norm(r32.pts - r64.pts, axis=1)
    out = {
        "n_cam": int(n_cam),
        "n_obs": int(obs.uv.shape[0]),
        "mre_f32_px": round(float(r32.mre), 6),
        "mre_f64_px": round(float(r64.mre), 6),
        "mre_delta_px": round(abs(float(r32.mre) - float(r64.mre)), 6),
        "cam_pos_delta_mean_m": round(float(cam_delta.mean()), 6),
        "cam_pos_delta_max_m": round(float(cam_delta.max()), 6),
        "pt_delta_median_m": round(float(np.median(pt_delta)), 6),
        "iters_f32": r32.iters,
        "iters_f64": r64.iters,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
