"""Multi-chip scaling over a jax.sharding.Mesh.

The reference is single-process/single-thread (SURVEY.md §2f: no
multiprocessing, MPI, or NCCL anywhere); its scale story is work-list
windowing and LRU caches. The TPU-native substitution (SURVEY.md §5):

- **pair matching is data-parallel over pairs**: the batched matcher's pair
  axis is sharded over the ``dp`` mesh axis — each chip matches its own
  pairs, zero communication;
- **bundle adjustment is data-parallel over observations**: the observation
  arrays shard over ``dp`` while cameras/points stay replicated; every
  ``segment_sum`` in the Schur matvec becomes a local partial sum + psum over
  ICI, which XLA's SPMD partitioner inserts automatically from the sharding
  annotations. The CG state (n_cam × 7) is replicated — tiny — so the only
  collective per matvec is the (n_cam·7 + n_pt·3)-sized reductions.

Multi-host missions extend the same mesh over DCN via jax.distributed; the
code here is mesh-shape-agnostic.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ba import bundle


def make_mesh(devices=None, axis="dp") -> Mesh:
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (axis,))


def pad_observations(obs: bundle.BAObservations, multiple: int):
    """Pad the observation axis to a multiple (weight-0 rows are inert).

    pt_idx pads with the LAST value, not 0: chain-ordered setups have
    sorted pt_idx, which enables scatter-free segment sums in the BA step
    — a 0 tail would break the sortedness the solver detects."""
    n = obs.uv.shape[0]
    n_pad = ((n + multiple - 1) // multiple) * multiple
    if n_pad == n:
        return obs
    extra = n_pad - n
    pt = np.asarray(obs.pt_idx)
    pt_fill = pt[-1] if len(pt) else 0
    return bundle.BAObservations(
        cam_idx=np.concatenate([np.asarray(obs.cam_idx), np.zeros(extra, np.int32)]),
        pt_idx=np.concatenate([pt, np.full(extra, pt_fill, np.int32)]),
        uv=np.concatenate([np.asarray(obs.uv), np.zeros((extra, 2), np.float32)]),
        weight=np.concatenate([np.asarray(obs.weight), np.zeros(extra, np.float32)]),
    )


def shard_observations(obs: bundle.BAObservations, mesh: Mesh, axis="dp"):
    """Pad + place observation arrays sharded over the mesh axis."""
    obs = pad_observations(obs, mesh.devices.size)
    sh = NamedSharding(mesh, P(axis))
    return bundle.BAObservations(
        cam_idx=jax.device_put(jnp.asarray(obs.cam_idx), sh),
        pt_idx=jax.device_put(jnp.asarray(obs.pt_idx), sh),
        uv=jax.device_put(jnp.asarray(obs.uv), sh),
        weight=jax.device_put(jnp.asarray(obs.weight), sh),
    )


def sharded_lm_step(mesh: Mesh, axis="dp", cg_iters=40, cg_tol=1e-3):
    """Jit the BA step with observations sharded over the mesh: XLA SPMD
    turns the segment_sums into local reductions + psum over ICI.

    Returns step(cams, pts, obs, K, dist, lam) — problem sizes come from the
    array shapes (pjit forbids kwargs with explicit shardings)."""
    obs_sh = bundle.BAObservations(
        cam_idx=NamedSharding(mesh, P(axis)),
        pt_idx=NamedSharding(mesh, P(axis)),
        uv=NamedSharding(mesh, P(axis)),
        weight=NamedSharding(mesh, P(axis)),
    )
    rep = NamedSharding(mesh, P())

    def impl(cams, pts, obs, K, dist, lam):
        return bundle.lm_step_impl(cams, pts, obs, K, dist, lam,
                                   cams.shape[0], pts.shape[0],
                                   cg_iters=cg_iters, cg_tol=cg_tol)

    return jax.jit(
        impl,
        in_shardings=(rep, rep, obs_sh, rep, rep, rep),
        out_shardings=(rep, rep, rep),
    )


def _jac_shardings(mesh: Mesh, axis="dp"):
    """Sharding pytree matching bundle.lm_jacobians' output: per-observation
    arrays (Jc/Jp/r) stay sharded over the obs axis; the reduced blocks
    (g_c, g_p, Hcc, hpp — psum results) are replicated."""
    sh = NamedSharding(mesh, P(axis))
    rep = NamedSharding(mesh, P())
    return (tuple(tuple(sh for _ in range(7)) for _ in range(2)),
            tuple(tuple(sh for _ in range(3)) for _ in range(2)),
            (sh, sh), rep, (rep, rep, rep), rep,
            tuple(rep for _ in range(6)))


def sharded_lm_jacobians(mesh: Mesh, axis="dp", pt_sorted=False):
    """The λ-independent jacobian precompute, observation-sharded. Pairs
    with sharded_lm_solve so λ retries reuse the JVPs (same split as the
    single-chip bundle.solve)."""
    obs_sh = bundle.BAObservations(
        cam_idx=NamedSharding(mesh, P(axis)),
        pt_idx=NamedSharding(mesh, P(axis)),
        uv=NamedSharding(mesh, P(axis)),
        weight=NamedSharding(mesh, P(axis)),
    )
    rep = NamedSharding(mesh, P())

    def impl(cams, pts, obs, K, dist):
        return bundle.lm_jacobians_impl(cams, pts, obs, K, dist,
                                        cams.shape[0], pts.shape[0],
                                        pt_sorted=pt_sorted)

    return jax.jit(impl, in_shardings=(rep, rep, obs_sh, rep, rep),
                   out_shardings=_jac_shardings(mesh, axis))


def sharded_lm_solve(mesh: Mesh, axis="dp", cg_iters=40, cg_tol=1e-3,
                     pt_sorted=False):
    """The per-λ damped Schur/PCG solve over precomputed sharded jacobians."""
    sh = NamedSharding(mesh, P(axis))
    rep = NamedSharding(mesh, P())

    def impl(jac, cam_idx, pt_idx, lam):
        return bundle.lm_solve_impl(jac, cam_idx, pt_idx, lam,
                                    cg_iters=cg_iters, cg_tol=cg_tol,
                                    pt_sorted=pt_sorted)

    return jax.jit(impl,
                   in_shardings=(_jac_shardings(mesh, axis), sh, sh, rep),
                   out_shardings=(rep, rep, rep))


# ---------------------------------------------------------------------------
# Point-local sharded BA (shard_map)
# ---------------------------------------------------------------------------
#
# The NamedSharding formulation above lets XLA's SPMD partitioner place the
# collectives — which inserts a (n_pt, 3)-sized psum into EVERY CG matvec
# (the H_cp·Hpp⁻¹·H_pc point reduction), the dominant cost of the measured
# 13.6× 8-rank BA overhead (BENCH_scaling.json r3). The point-local design
# below partitions chain-ordered observations at point boundaries, so each
# point's observations live on exactly one shard: all point reductions are
# shard-local, and the only per-CG-iteration collective is the (n_cam, 7)
# camera reduction (a few KB) — the scaling-book recipe of choosing the
# sharding so collectives ride the small axis.


class PointPartition:
    """Host-side partition of chain-ordered observations into equal-length
    per-shard chunks that never split a point across shards.

    Attributes (R = n_shards, L = padded obs/shard, M = padded pts/shard):
      cam_idx (R·L,) int32; ptl_idx (R·L,) int32 LOCAL point ids;
      uv (R·L, 2) f32; weight (R·L,) f32 (0 on padding);
      pt_off (R,) first global point of each shard; m_pts (R,) real point
      count per shard; n_pt_pad ≥ max(pt_off + M) scatter bound."""

    def __init__(self, obs: bundle.BAObservations, n_pt: int, n_shards: int):
        pt = np.asarray(obs.pt_idx)
        cam = np.asarray(obs.cam_idx)
        uv = np.asarray(obs.uv)
        w = np.asarray(obs.weight)
        order = None
        if not np.all(np.diff(pt) >= 0):
            order = np.argsort(pt, kind="stable")
            pt, cam, uv, w = pt[order], cam[order], uv[order], w[order]
        n = len(pt)
        splits = [0]
        for s in range(1, n_shards):
            t = min(round(s * n / n_shards), n)
            while 0 < t < n and pt[t] == pt[t - 1]:
                t += 1
            splits.append(max(min(t, n), splits[-1]))
        splits.append(n)
        self.L = L = max(1, int(np.max(np.diff(splits))))
        pt_lo = np.zeros(n_shards + 1, np.int64)
        for s in range(1, n_shards):
            lo = pt[splits[s]] if splits[s] < n else n_pt
            pt_lo[s] = max(lo, pt_lo[s - 1])
        pt_lo[n_shards] = n_pt
        self.M = M = max(1, int(np.max(np.diff(pt_lo))))
        self.pt_off = pt_lo[:n_shards].astype(np.int32)
        self.m_pts = np.diff(pt_lo).astype(np.int32)
        self.n_pt_pad = int(self.pt_off.max()) + M
        R = n_shards
        self.cam_idx = np.zeros(R * L, np.int32)
        self.ptl_idx = np.zeros(R * L, np.int32)
        self.uv = np.zeros((R * L, 2), np.float32)
        self.weight = np.zeros(R * L, np.float32)
        for s in range(R):
            a, b = splits[s], splits[s + 1]
            k = b - a
            self.cam_idx[s * L:s * L + k] = cam[a:b]
            self.ptl_idx[s * L:s * L + k] = pt[a:b] - self.pt_off[s]
            self.uv[s * L:s * L + k] = uv[a:b]
            self.weight[s * L:s * L + k] = w[a:b]
            # padding keeps local pt ids sorted and in-range; weight 0
            self.ptl_idx[s * L + k:(s + 1) * L] = max(self.m_pts[s] - 1, 0)


def make_pointlocal_ba(mesh: Mesh, part: PointPartition, n_pt: int,
                       axis="dp", cg_iters=40, cg_tol=1e-3):
    """Build (jac_fn, solve_fn, cost_fn) over a point-boundary observation
    partition. Signatures match _solve_loop's expectations; the obs object
    threads the partitioned flat arrays (pt_idx = LOCAL ids)."""
    M, n_pt_pad = part.M, part.n_pt_pad
    sh, rep = P(axis), P()
    pt_off = jax.device_put(jnp.asarray(part.pt_off),
                            NamedSharding(mesh, P(axis)))
    m_pts = jax.device_put(jnp.asarray(part.m_pts),
                           NamedSharding(mesh, P(axis)))
    jac_specs = (tuple(tuple(sh for _ in range(7)) for _ in range(2)),
                 tuple(tuple(sh for _ in range(3)) for _ in range(2)),
                 (sh, sh), rep, (sh, sh, sh), rep,
                 tuple(sh for _ in range(6)))

    def _pts_local(pts, off):
        pts_pad = jnp.pad(pts, ((0, n_pt_pad - pts.shape[0]), (0, 0)))
        return jax.lax.dynamic_slice(pts_pad, (off, 0), (M, 3))

    def jac_shard(cams, pts, cam_idx, ptl, uv, w, off, K, dist):
        obs_loc = bundle.BAObservations(cam_idx, ptl, uv, w)
        return bundle.lm_jacobians_impl(cams, _pts_local(pts, off[0]),
                                        obs_loc, K, dist, cams.shape[0], M,
                                        pt_sorted=True, axis_name=axis)

    jac_sm = jax.jit(jax.shard_map(
        jac_shard, mesh=mesh,
        in_specs=(rep, rep, sh, sh, sh, sh, sh, rep, rep),
        out_specs=jac_specs))

    # pt_off / m_pts ride as ARGUMENTS through every jit boundary: closing
    # over a multi-process-sharded array inside a traced function is
    # rejected ("spans non-addressable devices") under jax.distributed
    def jac_fn(cams, pts, o, K, dist):
        return jac_sm(cams, pts, o.cam_idx, o.pt_idx, o.uv, o.weight,
                      pt_off, K, dist)

    def solve_shard(jac, cam_idx, ptl, off, m, lam):
        return bundle.lm_solve_impl(jac, cam_idx, ptl, lam,
                                    cg_iters=cg_iters, cg_tol=cg_tol,
                                    pt_sorted=True, axis_name=axis,
                                    pt_off=off[0], m_pts=m[0],
                                    n_pt_out=n_pt_pad)

    solve_sm = jax.jit(jax.shard_map(
        solve_shard, mesh=mesh,
        in_specs=(jac_specs, sh, sh, sh, sh, rep),
        out_specs=(rep, rep, rep)))

    def solve_fn(jac, cam_idx, ptl, lam):
        dc, dp_pad, pred = solve_sm(jac, cam_idx, ptl, pt_off, m_pts, lam)
        return dc, dp_pad[:n_pt], pred

    def cost_shard(cams, pts, cam_idx, ptl, uv, w, off, K, dist):
        obs_loc = bundle.BAObservations(cam_idx, ptl, uv, w)
        r = bundle._residuals(cams, _pts_local(pts, off[0]), obs_loc, K,
                              dist)
        cost, asum, wsum = jax.lax.psum(
            (0.5 * jnp.sum(r * r), jnp.sum(jnp.abs(r)), jnp.sum(w)), axis)
        mre = asum / (2.0 * jnp.maximum(wsum, 1.0))
        mx = jax.lax.pmax(jnp.max(jnp.abs(r)), axis)
        return cost, mre, mx

    cost_sm = jax.jit(jax.shard_map(
        cost_shard, mesh=mesh,
        in_specs=(rep, rep, sh, sh, sh, sh, sh, rep, rep),
        out_specs=(rep, rep, rep)))

    def cost_fn(cams, pts, o, K, dist):
        return cost_sm(cams, pts, o.cam_idx, o.pt_idx, o.uv, o.weight,
                       pt_off, K, dist)

    return jac_fn, solve_fn, cost_fn


def solve_sharded(cams0, pts0, obs, K, dist, mesh: Mesh,
                  config: bundle.BAConfig = bundle.BAConfig(), verbose=True,
                  log_fn=print):
    """bundle.solve with the inner step sharded over a device mesh
    (point-local shard_map: one small camera psum per CG matvec)."""
    n_pt = np.asarray(pts0).shape[0]
    part = PointPartition(obs, n_pt, mesh.devices.size)
    jac_fn, solve_fn, cost_fn = make_pointlocal_ba(
        mesh, part, n_pt, cg_iters=config.cg_iters, cg_tol=config.cg_tol)
    sh = NamedSharding(mesh, P("dp"))
    obs_dev = bundle.BAObservations(
        cam_idx=jax.device_put(jnp.asarray(part.cam_idx), sh),
        pt_idx=jax.device_put(jnp.asarray(part.ptl_idx), sh),
        uv=jax.device_put(jnp.asarray(part.uv), sh),
        weight=jax.device_put(jnp.asarray(part.weight), sh),
    )
    return _solve_loop(cams0, pts0, obs_dev, K, dist, config, jac_fn,
                       solve_fn, cost_fn, verbose, log_fn)


def _solve_loop(cams0, pts0, obs, K, dist, config, jac_fn, solve_fn, cost_fn,
                verbose, log_fn):
    """The LM outer loop shared by single- and multi-chip paths (mirrors
    bundle.solve; kept separate so the sharded jac/solve/cost are injected).
    Jacobians are computed once per outer iteration and reused across λ
    retries; damping adapts via the Nielsen gain ratio."""
    cams = jnp.asarray(cams0, dtype=jnp.float32)
    pts = jnp.asarray(pts0, dtype=jnp.float32)
    ned0 = cams[:, :3]
    lo = ned0 - jnp.array([config.bound_horiz, config.bound_horiz, config.bound_vert])
    hi = ned0 + jnp.array([config.bound_horiz, config.bound_horiz, config.bound_vert])

    lam = config.lam0
    nu = 2.0
    cost, mre, mx = cost_fn(cams, pts, obs, K, dist)
    cost = float(cost)
    history = [cost]
    if verbose:
        log_fn(f"BA start: cost={cost:.4g} mre={float(mre):.3f}px max={float(mx):.2f}px")
    it = 0
    for it in range(config.max_iters):
        accepted = False
        jac = jac_fn(cams, pts, obs, K, dist)
        for _ in range(config.max_retries):
            dc, dp, pred_dec = solve_fn(jac, obs.cam_idx, obs.pt_idx,
                                        jnp.float32(lam))
            cams_new = cams + dc
            ned = jnp.clip(cams_new[:, :3], lo, hi)
            q = cams_new[:, 3:7]
            q = q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), 1e-12)
            cams_new = jnp.concatenate([ned, q], axis=1)
            pts_new = pts + dp
            new_cost, new_mre, new_mx = cost_fn(cams_new, pts_new, obs, K, dist)
            new_cost = float(new_cost)
            if np.isfinite(new_cost) and new_cost < cost:
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
                    accepted = "converged"
                break
            lam = min(lam * nu, 1e6)
            nu = min(nu * 2.0, 64.0)
        if accepted == "converged" or not accepted:
            break
    _, mre, _ = cost_fn(cams, pts, obs, K, dist)
    return bundle.BAResult(np.asarray(cams), np.asarray(pts), float(mre),
                           it + 1, history)


# ---------------------------------------------------------------------------
# Sharded feature detection
# ---------------------------------------------------------------------------

def sharded_detect(mesh: Mesh, per_octave, n_octaves, axis="dp"):
    """The batched SIFT detector with its image axis sharded over the mesh:
    each chip detects its own images, zero communication. Feed image counts
    that are multiples of the mesh size (pad with blanks)."""
    from ..features.sift_tpu import _detect_batch

    img_sh = NamedSharding(mesh, P(axis))

    def impl(imgs):
        return _detect_batch(imgs, per_octave, n_octaves)

    return jax.jit(impl, in_shardings=(img_sh,),
                   out_shardings=(img_sh, img_sh, img_sh, img_sh))


# ---------------------------------------------------------------------------
# Sharded pair matching
# ---------------------------------------------------------------------------

def sharded_match_pair_batch(mesh: Mesh, axis="dp", ratio=0.75, thresh=3.0,
                             **static_kwargs):
    """The batched matcher with its pair axis sharded over the mesh: each
    chip matches batch_size/n_devices pairs, no communication. ratio is
    compile-time (it bakes into the fused match kernel)."""
    from ..match.matcher import match_pair_batch

    pair_sh = NamedSharding(mesh, P(axis))
    rep = NamedSharding(mesh, P())

    inner = match_pair_batch.__wrapped__  # unjitted impl

    def fn(desc_a, desc_b, uv_a, uv_b, n_a, n_b, keys, K):
        return inner(desc_a, desc_b, uv_a, uv_b, n_a, n_b, keys, K,
                     ratio=ratio, thresh=thresh, **static_kwargs)

    return jax.jit(
        fn,
        in_shardings=(pair_sh, pair_sh, pair_sh, pair_sh, pair_sh, pair_sh,
                      pair_sh, rep),
        out_shardings=(pair_sh, pair_sh),
    )
