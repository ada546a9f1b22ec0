"""Sparse bundle adjustment: matrix-free Schur-complement Levenberg–Marquardt.

Replaces the reference's scipy ``least_squares(method='trf',
jac_sparsity=...)`` bundle adjuster (reference optimizer.py:283-541) with a
TPU-native design:

- residuals: reprojection error of every observation, computed batched via
  the differentiable camera model (core/camera.py project_ned_quat) —
  equivalent to the cv2.projectPoints loop at reference optimizer.py:174-279;
- per-observation jacobian blocks Jc (2×7 wrt camera ned+quat) and Jp (2×3
  wrt point) via vmapped forward-mode autodiff — the reference's
  finite-difference TRF jacobian becomes exact;
- normal equations are **never materialized**: the camera-reduced
  (Schur-complement) system S·Δc = b is solved with preconditioned CG where
  each matvec is two segment_sums over observations plus batched 3×3
  point-block solves; the per-camera 7×7 blocks of H_cc serve as a
  block-Jacobi preconditioner;
- Levenberg–Marquardt damping λ·diag(H) plays the role of scipy's trust
  region + x_scale='jac' column scaling (reference optimizer.py:491-501);
- camera positions are box-clamped to ±3 m horizontal / ±9 m vertical of the
  initial GPS solution after every accepted step — the projection equivalent
  of the reference's TRF bounds (optimizer.py:425-478);
- every array op is a gather/segment_sum/einsum over statically shaped
  observation arrays ⇒ shards cleanly over a device mesh by splitting the
  observation axis (see parallel/).

Camera parameterization matches the reference default ``ned_quat`` (7 params:
NED position + NED→body quaternion, optimizer.py:65-79). The quaternion is
normalized inside the residual, so its gauge direction is handled by the
damping; quats are renormalized after each accepted step.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.camera import project_ned_quat
from ..core.transforms import umeyama


class BAObservations(NamedTuple):
    """Static-shape observation arrays (pad with weight 0).

    cam_idx/pt_idx: (n_obs,) int32; uv: (n_obs, 2) observed distorted pixel
    coords; weight: (n_obs,) float — 0 for padding, 1 (or robust weight)
    otherwise.
    """

    cam_idx: jnp.ndarray
    pt_idx: jnp.ndarray
    uv: jnp.ndarray
    weight: jnp.ndarray


class BAConfig(NamedTuple):
    max_iters: int = 50
    ftol: float = 1e-4          # relative cost decrease stop (reference ftol, optimizer.py:77-79)
    lam0: float = 1e-3
    lam_up: float = 4.0
    lam_down: float = 3.0
    cg_iters: int = 40
    cg_tol: float = 1e-3
    max_retries: int = 6
    bound_horiz: float = 3.0    # reference optimizer.py:434-442
    bound_vert: float = 9.0


def _residuals(cams, pts, obs, K, dist):
    """(n_obs, 2) weighted residuals (pred − observed)."""
    c = cams[obs.cam_idx]
    p = pts[obs.pt_idx]
    pred, _ = project_ned_quat(p, c[:, :3], c[:, 3:7], K, dist)
    return (pred - obs.uv) * obs.weight[:, None]


def _per_obs_jacobians_1d(cams, pts, obs, K, dist):
    """Per-observation jacobians and residuals as LISTS of (n_obs,) arrays.

    TPU memory layout is the design constraint here: any (n_obs, small)
    or (n_obs, 7, 7) array tiles its trailing dims up to (8, 128), so the
    innocent einsum temp (n,7,7) of a 4.06M-observation mission
    materializes 15.5 GB on a 16 GB chip (measured OOM), and a vmapped
    jacfwd's 10 live tangent chains add more. Keeping every n-sized array
    strictly 1-D sidesteps the tiling entirely; the small dims (2 residual
    rows × 10 parameters) unroll in Python. One JVP of the whole-batch
    residual per parameter direction gives the exact jacobian with a
    single forward chain live at a time.

    Returns (Jc [2][7] of (n,), Jp [2][3] of (n,), r [2] of (n,))."""
    c = cams[obs.cam_idx]
    p = pts[obs.pt_idx]
    uv, w = obs.uv, obs.weight

    def F(cp):
        c_, p_ = cp
        pred, _ = project_ned_quat(p_, c_[:, :3], c_[:, 3:7], K, dist)
        return (pred - uv) * w[:, None]

    n = c.shape[0]
    r2 = F((c, p))
    r = [r2[:, 0], r2[:, 1]]
    Jc = [[None] * 7 for _ in range(2)]
    Jp = [[None] * 3 for _ in range(2)]
    zc = jnp.zeros((n, 7), dtype=cams.dtype)
    zp = jnp.zeros((n, 3), dtype=cams.dtype)
    for k in range(10):
        ec = zc if k >= 7 else zc.at[:, k].set(1.0)
        ep = zp if k < 7 else zp.at[:, k - 7].set(1.0)
        _, col = jax.jvp(F, ((c, p),), ((ec, ep),))
        for i in range(2):
            if k < 7:
                Jc[i][k] = col[:, i]
            else:
                Jp[i][k - 7] = col[:, i]
    return Jc, Jp, r


def _seg(x, idx, num, sorted_idx=False):
    # indices_are_sorted lets XLA lower the reduction without a general
    # scatter; obs from ba/setup.py are chain-ordered so pt_idx is sorted
    # (solve() verifies on the host before claiming it)
    return jax.ops.segment_sum(x, idx, num_segments=num,
                               indices_are_sorted=sorted_idx)


def lm_jacobians_impl(cams, pts, obs, K, dist, n_cam, n_pt,
                      pt_sorted=False, axis_name=None):
    """The λ-independent half of the LM step: per-observation jacobians,
    gradients, and undamped normal-equation blocks. Computed ONCE per outer
    LM iteration and reused across λ retries by lm_solve — the 10
    whole-batch JVPs are the dominant BA cost at mission scale (4M obs),
    and they don't depend on the damping.

    axis_name: when called per-shard inside shard_map (point-local sharded
    BA, parallel/sharded.py), camera reductions psum over the mesh axis
    while point reductions stay shard-local (n_pt is then the LOCAL point
    count and obs.pt_idx holds local indices).

    Returns a pytree of (Jc 2×7, Jp 2×3, r 2 of (n,); g_c (n_cam,7);
    g_p 3 of (n_pt,); Hcc (n_cam,7,7); hpp 6 of (n_pt,) upper-triangular
    order (00,01,02,11,12,22))."""
    Jc, Jp, r = _per_obs_jacobians_1d(cams, pts, obs, K, dist)
    cam_idx, pt_idx = obs.cam_idx, obs.pt_idx

    def segc(x):
        return _seg(x, cam_idx, n_cam)

    def segp(x):
        return _seg(x, pt_idx, n_pt, sorted_idx=pt_sorted)

    # gradients: g_c (n_cam, 7) dense; g_p as 3 × (n_pt,)
    g_c = jnp.stack([segc(Jc[0][j] * r[0] + Jc[1][j] * r[1])
                     for j in range(7)], axis=1)
    g_p = tuple(segp(Jp[0][k] * r[0] + Jp[1][k] * r[1]) for k in range(3))

    # camera blocks: (n_cam, 7, 7) dense is tiny
    Hcc = jnp.stack(
        [jnp.stack([segc(Jc[0][k] * Jc[0][l] + Jc[1][k] * Jc[1][l])
                    for l in range(7)], axis=1) for k in range(7)], axis=1)

    # point blocks: symmetric 3×3 per point as 6 × (n_pt,), undamped
    hpp = tuple(segp(Jp[0][k] * Jp[0][l] + Jp[1][k] * Jp[1][l])
                for k in range(3) for l in range(k, 3))
    if axis_name:
        # camera blocks see every shard's observations: ONE fused psum of
        # the (n_cam·7 + n_cam·49)-sized stack per outer LM iteration;
        # point blocks stay shard-local by construction (observations are
        # partitioned at point-chain boundaries)
        g_c, Hcc = jax.lax.psum((g_c, Hcc), axis_name)
    return (tuple(tuple(row) for row in Jc), tuple(tuple(row) for row in Jp),
            tuple(r), g_c, g_p, Hcc, hpp)


def lm_solve_impl(jac, cam_idx, pt_idx, lam, cg_iters=40, cg_tol=1e-3,
                  pt_sorted=False, axis_name=None, pt_off=None, m_pts=None,
                  n_pt_out=None):
    """The per-λ half of the LM step: damp the precomputed blocks, solve the
    camera-reduced (Schur) system with PCG, back-substitute points.

    Every n_obs- and n_pt-sized quantity is kept as 1-D (n,) arrays with
    the small dimensions (2 residual rows, 7 camera / 3 point params)
    unrolled in Python: TPU tiles the trailing two dims of an array up to
    (8, 128), so per-obs (n,7,7) / per-point (n,3,3) temps inflate 20×
    (15.5 GB measured for 4.06M observations). Camera-sized arrays
    (n_cam ≤ thousands) stay dense. Returns (Δcams (n_cam,7),
    Δpts (n_pt,3), predicted_decrease).

    Point-local SPMD mode (axis_name set; called per-shard inside
    shard_map by parallel/sharded.py): observations are partitioned at
    point-chain boundaries, so every point's observations live on exactly
    ONE shard — all point-sized reductions (the Schur complement's
    H_cp·Hpp⁻¹·H_pc inner product) stay local, and the only per-CG-
    iteration collective is the (n_cam, 7) camera reduction. pt_idx holds
    LOCAL indices; pt_off is this shard's first global point, m_pts its
    real point count (rows beyond it are padding), n_pt_out the padded
    global point total for the returned (replicated) Δpts.
    """
    Jc, Jp, r, g_c, g_p, Hcc, hpp6 = jac
    n_cam = g_c.shape[0]
    n_pt = g_p[0].shape[0]

    eye7 = jnp.eye(7, dtype=g_c.dtype)
    dc = jnp.einsum("cii->ci", Hcc)
    Hcc_d = Hcc + lam * jnp.einsum("ci,ij->cij", dc, eye7) + 1e-8 * eye7

    # damp the symmetric 3×3 point blocks (hpp6 order: 00,01,02,11,12,22)
    hpp = {(0, 0): hpp6[0], (0, 1): hpp6[1], (0, 2): hpp6[2],
           (1, 1): hpp6[3], (1, 2): hpp6[4], (2, 2): hpp6[5]}
    a = hpp[(0, 0)] + lam * hpp[(0, 0)] + 1e-8
    d = hpp[(1, 1)] + lam * hpp[(1, 1)] + 1e-8
    f = hpp[(2, 2)] + lam * hpp[(2, 2)] + 1e-8
    b3, c3, e3 = hpp[(0, 1)], hpp[(0, 2)], hpp[(1, 2)]
    # closed-form symmetric 3×3 inverse (cofactors / det), all (n_pt,)
    A_ = d * f - e3 * e3
    B_ = c3 * e3 - b3 * f
    C_ = b3 * e3 - c3 * d
    det = a * A_ + b3 * B_ + c3 * C_
    det = jnp.where(jnp.abs(det) < 1e-20, 1e-20, det)
    i00 = A_ / det
    i01 = B_ / det
    i02 = C_ / det
    i11 = (a * f - c3 * c3) / det
    i12 = (b3 * c3 - a * e3) / det
    i22 = (a * d - b3 * b3) / det
    Hpp_inv = [[i00, i01, i02], [i01, i11, i12], [i02, i12, i22]]

    def hpp_solve(w):
        """Hpp⁻¹ · w for w = [3 × (n_pt,)]."""
        return [Hpp_inv[k][0] * w[0] + Hpp_inv[k][1] * w[1]
                + Hpp_inv[k][2] * w[2] for k in range(3)]

    # gathers/reductions run on (n, small) 2-D forms: ONE (n,7) gather costs
    # ~11 ms at 4M obs where seven 1-D column gathers cost 7×59 ms (TPU lays
    # (n,) one sublane deep; scripts_dev/ba_matvec_probe.py) — this is the
    # difference between 0.72 s and ~0.1 s per CG iteration. The (n, small)
    # temps here are transient fusion inputs, not the resident (n,7,7)
    # einsum blocks the 1-D jacobian storage exists to avoid.
    def gcam(v):
        vg2 = v[cam_idx]
        return [vg2[:, j] for j in range(7)]

    def gpt3(cols):
        yg2 = jnp.stack(cols, axis=1)[pt_idx]
        return [yg2[:, k] for k in range(3)]

    def segp3(cols):
        w2 = _seg(jnp.stack(cols, axis=1), pt_idx, n_pt, sorted_idx=pt_sorted)
        return [w2[:, k] for k in range(3)]

    def segc7(cols):
        s = _seg(jnp.stack(cols, axis=1), cam_idx, n_cam)
        # point-local SPMD: the ONLY per-matvec collective — (n_cam, 7)
        return jax.lax.psum(s, axis_name) if axis_name else s

    def schur_matvec(v):
        vg = gcam(v)
        u = [sum(Jc[i][j] * vg[j] for j in range(7)) for i in range(2)]
        w = segp3([Jp[0][k] * u[0] + Jp[1][k] * u[1] for k in range(3)])
        y = hpp_solve(w)
        yg = gpt3(y)
        z = [sum(Jp[i][k] * yg[k] for k in range(3)) for i in range(2)]
        corr = segc7([Jc[0][j] * z[0] + Jc[1][j] * z[1] for j in range(7)])
        direct = jnp.einsum("cij,cj->ci", Hcc_d, v)
        return direct - corr

    # rhs: b = −(g_c − H_cp Hpp⁻¹ g_p)
    y0 = hpp_solve(g_p)
    y0g = gpt3(y0)
    z0 = [sum(Jp[i][k] * y0g[k] for k in range(3)) for i in range(2)]
    b = -(g_c - segc7([Jc[0][j] * z0[0] + Jc[1][j] * z0[1]
                       for j in range(7)]))

    # block-Jacobi preconditioner from the damped camera blocks
    Pc = jnp.linalg.inv(Hcc_d + 1e-6 * eye7)

    def precond(x):
        return jnp.einsum("cij,cj->ci", Pc, x)

    def dot(a_, b_):
        return jnp.sum(a_ * b_)

    x0 = jnp.zeros_like(b)
    r0 = b
    z0c = precond(r0)
    p0 = z0c
    rz0 = dot(r0, z0c)
    b_norm = jnp.sqrt(dot(b, b)) + 1e-30

    def cg_body(state):
        x, rr, p, rz, it = state
        Ap = schur_matvec(p)
        alpha = rz / jnp.maximum(dot(p, Ap), 1e-30)
        x = x + alpha * p
        rr = rr - alpha * Ap
        zz = precond(rr)
        rz_new = dot(rr, zz)
        beta = rz_new / jnp.maximum(rz, 1e-30)
        p = zz + beta * p
        return x, rr, p, rz_new, it + 1

    def cg_cond(state):
        _, rr, _, _, it = state
        return (jnp.sqrt(dot(rr, rr)) / b_norm > cg_tol) & (it < cg_iters)

    dc_cam, _, _, _, _ = jax.lax.while_loop(cg_cond, cg_body, (x0, r0, p0, rz0, 0))

    # back-substitute points: Δp = Hpp⁻¹ (−g_p − H_pc Δc)
    dg = gcam(dc_cam)
    u = [sum(Jc[i][j] * dg[j] for j in range(7)) for i in range(2)]
    hpc_dc = segp3([Jp[0][k] * u[0] + Jp[1][k] * u[1] for k in range(3)])
    rhs_p = [-g_p[k] - hpc_dc[k] for k in range(3)]
    dp_cols = hpp_solve(rhs_p)
    if axis_name:
        # zero the padded local point rows (they'd land inside the NEXT
        # shard's slice of the scatter below)
        pmask = (jnp.arange(n_pt) < m_pts).astype(dp_cols[0].dtype)
        dp_cols = [c * pmask for c in dp_cols]
    dp_pts = jnp.stack(dp_cols, axis=1)

    # predicted decrease of the Gauss–Newton model for the LM gain ratio:
    # −(gᵀΔ + ½ΔᵀJᵀJΔ), with ΔᵀJᵀJΔ = ‖JΔ‖² from one full obs-apply
    # (u above is Jc·Δc; add Jp·Δp). Exact regardless of PCG tolerance —
    # the earlier −½gᵀΔ form dropped the curvature term and mis-scaled
    # the Nielsen damping adaptation.
    dpg = gpt3(dp_cols)
    Jdelta = [u[i] + sum(Jp[i][k] * dpg[k] for k in range(3))
              for i in range(2)]
    g_dot_d_pt = sum(jnp.sum(dp_cols[k] * g_p[k]) for k in range(3))
    jtj_quad = jnp.sum(Jdelta[0] * Jdelta[0]) + jnp.sum(Jdelta[1] * Jdelta[1])
    if axis_name:
        # shard-local scalars (obs and point sums) fold in one tiny psum;
        # the camera term is replicated — add it outside the psum
        g_dot_d_pt, jtj_quad = jax.lax.psum((g_dot_d_pt, jtj_quad),
                                            axis_name)
        # assemble the replicated global Δpts: each shard scatters its
        # masked rows into its slice of a zero buffer, one (n_pt_out, 3)
        # psum per λ solve (vs one per CG iteration in the naive sharding)
        dp_full = jnp.zeros((n_pt_out, 3), dp_pts.dtype)
        dp_full = jax.lax.dynamic_update_slice(dp_full, dp_pts, (pt_off, 0))
        dp_pts = jax.lax.psum(dp_full, axis_name)
    g_dot_d = dot(dc_cam, g_c) + g_dot_d_pt
    pred_dec = -(g_dot_d + 0.5 * jtj_quad)
    return dc_cam, dp_pts, pred_dec


def lm_step_impl(cams, pts, obs, K, dist, lam, n_cam, n_pt, cg_iters=40,
                 cg_tol=1e-3, pt_sorted=False):
    """One damped Gauss–Newton step: jacobian precompute + damped solve in a
    single graph (kept for one-shot callers; solve() calls the two halves
    separately so λ retries reuse the jacobians)."""
    jac = lm_jacobians_impl(cams, pts, obs, K, dist, n_cam, n_pt,
                            pt_sorted=pt_sorted)
    return lm_solve_impl(jac, obs.cam_idx, obs.pt_idx, lam,
                         cg_iters=cg_iters, cg_tol=cg_tol,
                         pt_sorted=pt_sorted)


lm_step = functools.partial(
    jax.jit, static_argnames=("n_cam", "n_pt", "cg_iters", "cg_tol",
                              "pt_sorted"))(lm_step_impl)
lm_jacobians = functools.partial(
    jax.jit, static_argnames=("n_cam", "n_pt", "pt_sorted"))(lm_jacobians_impl)
lm_solve = functools.partial(
    jax.jit, static_argnames=("cg_iters", "cg_tol",
                              "pt_sorted"))(lm_solve_impl)


# ---------------------------------------------------------------------------
# Joint pose/point/global-calibration step (reference optimize_calib='global',
# optimizer.py:122-141, 180-196): the 8 shared [f, cx, cy, k1, k2, p1, p2, k3]
# parameters join the camera-reduced (Schur) system as a dense border block.
# ---------------------------------------------------------------------------

def _calib_K_dist(calib):
    K = jnp.array([[calib[0], 0.0, calib[1]],
                   [0.0, calib[0], calib[2]],
                   [0.0, 0.0, 1.0]])
    return K, calib[3:8]


def _per_obs_jacobians_calib_1d(cams, pts, obs, calib):
    """1-D form of the calib jacobians (see _per_obs_jacobians_1d for the
    TPU tiling rationale): Jc [2][7], Jp [2][3], Jk [2][8], r [2] of (n,).
    One whole-batch JVP per parameter direction (18 total)."""
    c = cams[obs.cam_idx]
    p = pts[obs.pt_idx]
    uv, w = obs.uv, obs.weight

    def F(args):
        c_, p_, cal_ = args
        K, dist = _calib_K_dist(cal_)
        pred, _ = project_ned_quat(p_, c_[:, :3], c_[:, 3:7], K, dist)
        return (pred - uv) * w[:, None]

    n = c.shape[0]
    r2 = F((c, p, calib))
    r = [r2[:, 0], r2[:, 1]]
    Jc = [[None] * 7 for _ in range(2)]
    Jp = [[None] * 3 for _ in range(2)]
    Jk = [[None] * 8 for _ in range(2)]
    zc = jnp.zeros((n, 7), dtype=cams.dtype)
    zp = jnp.zeros((n, 3), dtype=cams.dtype)
    zk = jnp.zeros((8,), dtype=cams.dtype)
    for k in range(18):
        ec = zc if not k < 7 else zc.at[:, k].set(1.0)
        ep = zp if not 7 <= k < 10 else zp.at[:, k - 7].set(1.0)
        ek = zk if not k >= 10 else zk.at[k - 10].set(1.0)
        _, col = jax.jvp(F, ((c, p, calib),), ((ec, ep, ek),))
        for i in range(2):
            if k < 7:
                Jc[i][k] = col[:, i]
            elif k < 10:
                Jp[i][k - 7] = col[:, i]
            else:
                Jk[i][k - 10] = col[:, i]
    return Jc, Jp, Jk, r


def lm_step_calib_impl(cams, pts, calib, obs, lam, gps_ned, gps_w, n_cam,
                       n_pt, cg_iters=60, cg_tol=1e-3):
    """Damped GN step over (cameras, points, shared calibration).

    gps_ned (n_cam, 3) + gps_w (px²/m² weight): soft GPS position prior —
    without it the global focal length trades freely against camera heights
    inside the box bounds (f·h gauge). gps_w=0 disables.
    """
    Jc, Jp, Jk, r = _per_obs_jacobians_calib_1d(cams, pts, obs, calib)
    cam_idx, pt_idx = obs.cam_idx, obs.pt_idx

    def segc(x):
        return _seg(x, cam_idx, n_cam)

    def segp1(x):
        return _seg(x, pt_idx, n_pt)

    g_c = jnp.stack([segc(Jc[0][j] * r[0] + Jc[1][j] * r[1])
                     for j in range(7)], axis=1)
    g_p = [segp1(Jp[0][k] * r[0] + Jp[1][k] * r[1]) for k in range(3)]
    g_k = jnp.stack([jnp.sum(Jk[0][j] * r[0] + Jk[1][j] * r[1])
                     for j in range(8)])
    Hcc = jnp.stack(
        [jnp.stack([segc(Jc[0][k] * Jc[0][l] + Jc[1][k] * Jc[1][l])
                    for l in range(7)], axis=1) for k in range(7)], axis=1)
    Hkk = jnp.stack(
        [jnp.stack([jnp.sum(Jk[0][k] * Jk[0][l] + Jk[1][k] * Jk[1][l])
                    for l in range(8)]) for k in range(8)])

    # GPS prior contributes gps_w·(ned − gps) to the gradient and gps_w·I to
    # the position block of H_cc
    g_c = g_c.at[:, :3].add(gps_w * (cams[:, :3] - gps_ned))
    Hcc = Hcc.at[:, 0, 0].add(gps_w).at[:, 1, 1].add(gps_w).at[:, 2, 2].add(gps_w)

    eye7 = jnp.eye(7, dtype=cams.dtype)
    eye8 = jnp.eye(8, dtype=cams.dtype)
    dc = jnp.einsum("cii->ci", Hcc)
    dk = jnp.diag(Hkk)

    # damped symmetric 3×3 point blocks + closed-form inverse, all (n_pt,)
    hpp = {}
    for k in range(3):
        for l in range(k, 3):
            hpp[(k, l)] = segp1(Jp[0][k] * Jp[0][l] + Jp[1][k] * Jp[1][l])
    a = hpp[(0, 0)] * (1.0 + lam) + 1e-8
    d = hpp[(1, 1)] * (1.0 + lam) + 1e-8
    f = hpp[(2, 2)] * (1.0 + lam) + 1e-8
    b3, c3, e3 = hpp[(0, 1)], hpp[(0, 2)], hpp[(1, 2)]
    A_ = d * f - e3 * e3
    B_ = c3 * e3 - b3 * f
    C_ = b3 * e3 - c3 * d
    det = a * A_ + b3 * B_ + c3 * C_
    det = jnp.where(jnp.abs(det) < 1e-20, 1e-20, det)
    Hpp_inv = [[A_ / det, B_ / det, C_ / det],
               [B_ / det, (a * f - c3 * c3) / det, (b3 * c3 - a * e3) / det],
               [C_ / det, (b3 * c3 - a * e3) / det, (a * d - b3 * b3) / det]]

    def hpp_solve(w):
        return [Hpp_inv[k][0] * w[0] + Hpp_inv[k][1] * w[1]
                + Hpp_inv[k][2] * w[2] for k in range(3)]

    def _obs_apply(v_c, v_k):
        """u_i = (Jc v_c + Jk v_k)_i as 2 × (n,)."""
        vg = [v_c[:, j][cam_idx] for j in range(7)]
        return [sum(Jc[i][j] * vg[j] for j in range(7))
                + sum(Jk[i][j] * v_k[j] for j in range(8)) for i in range(2)]

    def matvec(v):
        v_c, v_k = v
        u = _obs_apply(v_c, v_k)
        w = [segp1(Jp[0][k] * u[0] + Jp[1][k] * u[1]) for k in range(3)]
        y = hpp_solve(w)
        yg = [y[k][pt_idx] for k in range(3)]
        uz = [u[i] - sum(Jp[i][k] * yg[k] for k in range(3)) for i in range(2)]
        out_c = jnp.stack([segc(Jc[0][j] * uz[0] + Jc[1][j] * uz[1])
                           for j in range(7)], axis=1) \
            + lam * dc * v_c + 1e-8 * v_c
        out_c = out_c.at[:, :3].add(gps_w * v_c[:, :3])
        out_k = jnp.stack([jnp.sum(Jk[0][j] * uz[0] + Jk[1][j] * uz[1])
                           for j in range(8)]) + lam * dk * v_k + 1e-8 * v_k
        return out_c, out_k

    y0 = hpp_solve(g_p)
    y0g = [y0[k][pt_idx] for k in range(3)]
    z0 = [sum(Jp[i][k] * y0g[k] for k in range(3)) for i in range(2)]
    b_c = -(g_c - jnp.stack([segc(Jc[0][j] * z0[0] + Jc[1][j] * z0[1])
                             for j in range(7)], axis=1))
    b_k = -(g_k - jnp.stack([jnp.sum(Jk[0][j] * z0[0] + Jk[1][j] * z0[1])
                             for j in range(8)]))

    Pc = jnp.linalg.inv(Hcc + lam * jnp.einsum("ci,ij->cij", dc, eye7)
                        + 1e-6 * eye7)
    Pk = jnp.linalg.inv(Hkk + lam * jnp.diag(dk) + 1e-6 * eye8)

    def precond(v):
        return (jnp.einsum("cij,cj->ci", Pc, v[0]), Pk @ v[1])

    def dot(a, b):
        return jnp.sum(a[0] * b[0]) + jnp.sum(a[1] * b[1])

    def axpy(a, x, y):
        return (y[0] + a * x[0], y[1] + a * x[1])

    x0 = (jnp.zeros_like(b_c), jnp.zeros_like(b_k))
    r0 = (b_c, b_k)
    z0c = precond(r0)
    rz0 = dot(r0, z0c)
    b_norm = jnp.sqrt(dot(r0, r0)) + 1e-30

    def cg_body(state):
        x, rr, p, rz, it = state
        Ap = matvec(p)
        alpha = rz / jnp.maximum(dot(p, Ap), 1e-30)
        x = axpy(alpha, p, x)
        rr = axpy(-alpha, Ap, rr)
        zz = precond(rr)
        rz_new = dot(rr, zz)
        beta = rz_new / jnp.maximum(rz, 1e-30)
        p = (zz[0] + beta * p[0], zz[1] + beta * p[1])
        return x, rr, p, rz_new, it + 1

    def cg_cond(state):
        _, rr, _, _, it = state
        return (jnp.sqrt(dot(rr, rr)) / b_norm > cg_tol) & (it < cg_iters)

    (dc_cam, dk_cal), _, _, _, _ = jax.lax.while_loop(
        cg_cond, cg_body, (x0, r0, z0c, rz0, 0))

    u = _obs_apply(dc_cam, dk_cal)
    hpc = [segp1(Jp[0][k] * u[0] + Jp[1][k] * u[1]) for k in range(3)]
    dp_pts = jnp.stack(hpp_solve([-g_p[k] - hpc[k] for k in range(3)]),
                       axis=1)
    return dc_cam, dp_pts, dk_cal


lm_step_calib = functools.partial(
    jax.jit, static_argnames=("n_cam", "n_pt", "cg_iters", "cg_tol"))(
        lm_step_calib_impl)


def ba_cost_calib(cams, pts, calib, obs, gps_ned=None, gps_w=0.0):
    K, dist = _calib_K_dist(calib)
    cost, mre, mx = ba_cost(cams, pts, obs, K, dist)
    if gps_ned is not None:
        cost = cost + 0.5 * gps_w * jnp.sum((cams[:, :3] - gps_ned) ** 2)
    return cost, mre, mx


def solve_global_calib(cams0, pts0, obs, K0, dist0,
                       config: BAConfig = BAConfig(), gps_sigma_m=2.0,
                       verbose=True, log_fn=print):
    """LM loop jointly over poses, points, and the shared calibration
    (reference optimizer.py optimize_calib='global'). Returns
    (BAResult, K (3,3), dist (5,))."""
    cams = jnp.asarray(cams0, dtype=jnp.float32)
    pts = jnp.asarray(pts0, dtype=jnp.float32)
    K0 = np.asarray(K0)
    calib = jnp.asarray(np.r_[0.5 * (K0[0, 0] + K0[1, 1]), K0[0, 2], K0[1, 2],
                              np.asarray(dist0)].astype(np.float32))
    n_cam, n_pt = cams.shape[0], pts.shape[0]
    ned0 = cams[:, :3]
    lo = ned0 - jnp.array([config.bound_horiz, config.bound_horiz,
                           config.bound_vert])
    hi = ned0 + jnp.array([config.bound_horiz, config.bound_horiz,
                           config.bound_vert])

    gps_ned = jnp.asarray(np.asarray(cams0)[:, :3], dtype=jnp.float32)
    # weight in px²/m²: a 1 m position error ≈ (f/alt) px of reprojection;
    # sigma_m of GPS noise → w = 1/σ²
    gps_w = jnp.float32(1.0 / (gps_sigma_m ** 2)) if gps_sigma_m else jnp.float32(0.0)

    lam = config.lam0
    cost, mre, mx = ba_cost_calib(cams, pts, calib, obs, gps_ned, gps_w)
    cost = float(cost)
    history = [cost]
    if verbose:
        log_fn(f"BA+calib start: cost={cost:.4g} mre={float(mre):.3f}px")
    it = 0
    for it in range(config.max_iters):
        accepted = False
        for _ in range(config.max_retries):
            d_cam, d_pt, d_cal = lm_step_calib(cams, pts, calib, obs,
                                               jnp.float32(lam), gps_ned,
                                               gps_w, n_cam, n_pt,
                                               cg_iters=config.cg_iters)
            cams_new = cams + d_cam
            ned = jnp.clip(cams_new[:, :3], lo, hi)
            q = cams_new[:, 3:7]
            q = q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True),
                                1e-12)
            cams_new = jnp.concatenate([ned, q], axis=1)
            pts_new = pts + d_pt
            calib_new = calib + d_cal
            new_cost, new_mre, _ = ba_cost_calib(cams_new, pts_new, calib_new,
                                                 obs, gps_ned, gps_w)
            new_cost = float(new_cost)
            if np.isfinite(new_cost) and new_cost < cost:
                cams, pts, calib = cams_new, pts_new, calib_new
                rel = 1.0 - new_cost / cost
                cost = new_cost
                lam = max(lam / config.lam_down, 1e-9)
                accepted = True
                history.append(cost)
                if verbose:
                    log_fn(f"  iter {it}: mre={float(new_mre):.3f}px "
                           f"f={float(calib[0]):.2f} lam={lam:.1e}")
                if rel < config.ftol:
                    accepted = "converged"
                break
            lam = min(lam * config.lam_up, 1e6)
        if accepted == "converged" or not accepted:
            break
    _, mre, _ = ba_cost_calib(cams, pts, calib, obs)
    K, dist = _calib_K_dist(calib)
    result = BAResult(np.asarray(cams), np.asarray(pts), float(mre), it + 1,
                      history)
    return result, np.asarray(K), np.asarray(dist)


@functools.partial(jax.jit, static_argnames=())
def ba_cost(cams, pts, obs, K, dist):
    r = _residuals(cams, pts, obs, K, dist)
    cost = 0.5 * jnp.sum(r * r)
    wsum = jnp.maximum(jnp.sum(obs.weight), 1.0)
    mre = jnp.sum(jnp.abs(r)) / (2.0 * wsum)
    mx = jnp.max(jnp.abs(r))
    return cost, mre, mx


class BAResult(NamedTuple):
    cams: np.ndarray
    pts: np.ndarray
    mre: float
    iters: int
    cost_history: list


def reweight_huber(cams, pts, obs, K, dist, delta_px=4.0):
    """One IRLS reweighting pass: Huber weights w = min(1, δ/|r|) folded into
    the observation weights. The reference handles outliers by hard culling
    after the fit (4b-mre-by-image); a robust loss inside the fit keeps
    marginal observations contributing instead of binary keep/drop."""
    r = _residuals(cams, pts, obs, K, dist)
    mag = jnp.linalg.norm(r, axis=-1)
    base = jnp.where(obs.weight > 0, 1.0, 0.0)
    w = base * jnp.minimum(1.0, delta_px / jnp.maximum(mag, 1e-6))
    return obs._replace(weight=jnp.sqrt(w))


def cull_outliers(cams, pts, obs, K, dist, sigma=5.0, robust=True,
                  active=None):
    """Observation outlier mask at the current solution (the reference's
    4b-mre-by-image policy, 4b:117-150: drop |r| > mre + sigma*std).

    robust=True thresholds at median + sigma*1.4826*MAD instead: on a
    contaminated problem the outliers inflate mean and std so the
    reference formula's threshold floats above them (measured on the
    hard-regime bench: mean+5s recall 0.004 vs 0.99 robust). The
    reference achieves the same end by interactive review + repeated 4b
    passes; MAD gets there unattended.

    active: optional bool mask — statistics (and the returned mask) are
    computed over these rows only; inactive rows return True (untouched).
    Residuals are evaluated UNWEIGHTED so already-down-weighted rows
    still measure their true error. Returns (keep_mask, threshold)."""
    obs_unw = obs._replace(weight=jnp.ones_like(obs.weight))
    r = _residuals(jnp.asarray(cams, jnp.float32),
                   jnp.asarray(pts, jnp.float32), obs_unw, K, dist)
    mag = np.asarray(jnp.linalg.norm(r, axis=-1))
    sel = mag if active is None else mag[np.asarray(active)]
    if len(sel) == 0:
        return np.ones(len(mag), bool), float("inf")
    if robust:
        med = float(np.median(sel))
        mad = float(np.median(np.abs(sel - med)))
        thresh = med + sigma * 1.4826 * mad
    else:
        thresh = float(sel.mean() + sigma * sel.std())
    keep = mag <= thresh
    if active is not None:
        keep |= ~np.asarray(active)
    return keep, thresh


def solve_culled(cams0, pts0, obs, K, dist, config=None, huber_px=4.0,
                 cull_sigma=5.0, cull_rounds=3, verbose=True, log_fn=print,
                 bound_anchor=None):
    """The full 4a -> 4b -> 4a cadence unattended: graduated-IRLS solve,
    then up to cull_rounds of (robust cull -> refine). Returns
    (BAResult, keep_mask) — keep_mask marks the surviving observations.
    This is what the reference's manual process.py + 4b loop converges to
    on outlier-contaminated missions (scripts/README.md:197-217)."""
    config = config or BAConfig()
    anchor = (np.asarray(bound_anchor) if bound_anchor is not None
              else np.asarray(cams0)[:, :3])
    result = solve(cams0, pts0, obs, K, dist, config, verbose=verbose,
                   log_fn=log_fn, huber_px=huber_px, bound_anchor=anchor)
    active = np.ones(np.asarray(obs.uv).shape[0], bool)
    base_w = np.asarray(obs.weight)
    for rnd in range(cull_rounds):
        keep, thresh = cull_outliers(result.cams, result.pts, obs, K, dist,
                                     sigma=cull_sigma, active=active)
        drop = active & ~keep
        if not drop.any():
            break
        active &= keep
        if verbose:
            log_fn(f"cull round {rnd}: threshold {thresh:.2f}px, dropped "
                   f"{int(drop.sum())} obs ({int(active.sum())} remain)")
        # cull by ZEROING weights, not slicing: weight-0 rows are inert
        # (the padding convention), and keeping the observation arrays
        # shape-static means every refine reuses the compiled solver —
        # slicing re-specializes the jits per round (multi-minute remote
        # compiles on tunneled TPU runtimes)
        obs2 = obs._replace(weight=jnp.asarray(
            np.where(active, base_w, 0.0).astype(np.float32)))
        result = solve(result.cams, result.pts, obs2, K, dist, config,
                       verbose=verbose, log_fn=log_fn, huber_px=huber_px,
                       irls_rounds=1, bound_anchor=anchor)
    return result, active


def solve(cams0, pts0, obs, K, dist, config: BAConfig = BAConfig(), verbose=True,
          log_fn=print, huber_px=None, irls_rounds=2, dtype=None,
          bound_anchor=None):
    """LM outer loop (host-driven; every inner computation is one jitted call).

    cams0: (n_cam, 7) [ned(3), quat(4)]; pts0: (n_pt, 3); obs: BAObservations.
    huber_px: enable a robust loss via IRLS — after each of ``irls_rounds``
    convergences, observations are Huber-reweighted at that scale and the
    solve continues. Returns BAResult. Logs mre/std/max per improving
    iteration like the reference (optimizer.py:249-252).

    dtype: f32 default (the TPU production path); pass jnp.float64 (with
    jax_enable_x64, CPU) for the conditioning oracle — see
    scripts_dev/ba_f64_oracle.py.
    """
    if huber_px is not None:
        # graduated IRLS: the first round's Huber scale comes from the
        # CURRENT residual distribution (median), annealing down to
        # huber_px. Starting at the target scale fails on contaminated
        # problems from a degraded initialization — the first solve is
        # then effectively unweighted L2 (all residuals huge, weights
        # uniform) and 15-20% gross outliers drag it into a basin the
        # later reweightings cannot escape (measured on the hard-regime
        # bench: inlier p50 stuck at ~5-7 px vs 0.3 px with annealing).
        cams, pts = cams0, pts0
        r0 = _residuals(jnp.asarray(cams, jnp.float32),
                        jnp.asarray(pts, jnp.float32), obs, K, dist)
        delta = max(float(jnp.median(jnp.linalg.norm(r0, axis=-1))),
                    float(huber_px))
        result = None
        # bounds stay anchored at the ORIGINAL GPS positions across IRLS
        # rounds (reference optimizer.py:434-442 anchors at GPS): re-
        # anchoring at each round's estimate lets near-planar scenes
        # drift meters through the height/scale ambiguity the GPS box
        # exists to pin
        anchor = (np.asarray(bound_anchor) if bound_anchor is not None
                  else np.asarray(cams0)[:, :3])
        for _ in range(irls_rounds + 1):
            obs_w = reweight_huber(jnp.asarray(cams), jnp.asarray(pts), obs,
                                   K, dist, delta_px=delta)
            result = solve(cams, pts, obs_w, K, dist, config, verbose=verbose,
                           log_fn=log_fn, dtype=dtype, bound_anchor=anchor)
            cams, pts = result.cams, result.pts
            delta = max(delta / 6.0, float(huber_px))
        return result
    dtype = dtype or jnp.float32
    cams = jnp.asarray(cams0, dtype=dtype)
    pts = jnp.asarray(pts0, dtype=dtype)
    n_cam, n_pt = cams.shape[0], pts.shape[0]
    ned0 = (jnp.asarray(bound_anchor, dtype=dtype)
            if bound_anchor is not None else cams[:, :3])
    lo = ned0 - jnp.array([config.bound_horiz, config.bound_horiz, config.bound_vert])
    hi = ned0 + jnp.array([config.bound_horiz, config.bound_horiz, config.bound_vert])

    lam = config.lam0
    nu = 2.0
    # chain-ordered setups give sorted pt_idx → scatter-free segment sums
    pt_sorted = bool(np.all(np.diff(np.asarray(obs.pt_idx)) >= 0))
    cost, mre, mx = ba_cost(cams, pts, obs, K, dist)
    cost = float(cost)
    history = [cost]
    if verbose:
        log_fn(f"BA start: cost={cost:.4g} mre={float(mre):.3f}px max={float(mx):.2f}px")

    it = 0
    for it in range(config.max_iters):
        accepted = False
        # jacobians (10 whole-batch JVPs — the dominant cost at mission
        # scale) don't depend on λ: compute once, reuse across retries
        jac = lm_jacobians(cams, pts, obs, K, dist, n_cam, n_pt,
                           pt_sorted=pt_sorted)
        for _ in range(config.max_retries):
            dc, dp, pred_dec = lm_solve(jac, obs.cam_idx, obs.pt_idx,
                                        jnp.asarray(lam, dtype),
                                        cg_iters=config.cg_iters,
                                        cg_tol=config.cg_tol,
                                        pt_sorted=pt_sorted)
            cams_new = cams + dc
            # project onto bounds + renormalize quats
            ned = jnp.clip(cams_new[:, :3], lo, hi)
            q = cams_new[:, 3:7]
            q = q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), 1e-12)
            cams_new = jnp.concatenate([ned, q], axis=1)
            pts_new = pts + dp
            new_cost, new_mre, new_mx = ba_cost(cams_new, pts_new, obs, K, dist)
            new_cost = float(new_cost)
            if np.isfinite(new_cost) and new_cost < cost:
                # Nielsen gain-ratio damping: compare actual to predicted
                # decrease; good models shrink λ fast, poor ones grow it
                rho = (cost - new_cost) / max(float(pred_dec), 1e-30)
                cams, pts = cams_new, pts_new
                rel = 1.0 - new_cost / cost
                cost = new_cost
                lam = max(lam * max(1.0 / 3.0, 1.0 - (2.0 * rho - 1.0) ** 3),
                          1e-9)
                nu = 2.0
                accepted = True
                if verbose:
                    log_fn(f"  iter {it}: mre={float(new_mre):.3f}px "
                           f"max={float(new_mx):.2f}px cost={cost:.4g} lam={lam:.1e}")
                history.append(cost)
                if rel < config.ftol:
                    it += 1
                    accepted = "converged"
                break
            lam = min(lam * nu, 1e6)
            nu = min(nu * 2.0, 64.0)
        if accepted == "converged" or not accepted:
            break

    _, mre, _ = ba_cost(cams, pts, obs, K, dist)
    return BAResult(np.asarray(cams), np.asarray(pts), float(mre), it + 1, history)


def refit(cams, pts, gps_ned, use_cams=None):
    """Similarity re-registration of the optimized solution onto GPS positions.

    The reference's ``Optimizer.refit`` (optimizer.py:583-683): fit
    scale/R/t mapping optimized camera positions → original GPS NED, then
    apply to cameras (position + attitude) and points. use_cams: bool mask of
    cameras to include in the fit.
    """
    from ..core.rotations import matrix_to_quat, quat_multiply

    cams = jnp.asarray(cams)
    pts = jnp.asarray(pts)
    gps = jnp.asarray(gps_ned, dtype=cams.dtype)
    w = None if use_cams is None else jnp.asarray(use_cams, dtype=cams.dtype)
    s, R, t = umeyama(cams[:, :3], gps, weights=w)
    new_ned = s * cams[:, :3] @ R.T + t
    new_pts = s * pts @ R.T + t
    # rotate attitudes: body2ned' = R · body2ned
    q_rot = matrix_to_quat(R)
    new_q = quat_multiply(q_rot[None, :], cams[:, 3:7])
    new_cams = jnp.concatenate([new_ned, new_q], axis=1)
    return np.asarray(new_cams), np.asarray(new_pts), (float(s), np.asarray(R), np.asarray(t))
