"""Batched-hypothesis RANSAC: homography, fundamental, essential, similarity.

Replaces cv2.findHomography / findFundamentalMat / findEssentialMat /
estimateAffinePartial2D with RANSAC (reference matcher.py:90-142
``filter_by_transform``, matcher.py:452/532/637/803 homography seeds,
smart.py:66-114 affine). The reference's sequential adaptive RANSAC becomes a
**fixed-size hypothesis batch**: sample H hypotheses at once, solve all
minimal problems with one batched linear-algebra call, score all of them
against all points with one (H × N) evaluation, take the argmax, then refit on
the winner's inliers. Deterministic given the PRNG key (the reference seeds
FLANN/RANSAC from the clock — matcher.py:35-37; we are reproducible).

All functions are jit/vmap-clean with static shapes: points come padded with a
validity mask.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp


class RansacResult(NamedTuple):
    model: jnp.ndarray      # (3,3) H/F/E or (2,3) affine
    inliers: jnp.ndarray    # (N,) bool
    n_inliers: jnp.ndarray  # scalar int32
    ok: jnp.ndarray         # scalar bool — enough points / valid model


def _valid_cumsum(valid):
    """Inclusive rank of each entry among the valid ones: the shared
    selection structure for sampling and scoring. A cumsum + searchsorted
    replaces the earlier argsort(~valid) — a full 6k-element sort per pair
    was a visible slice of the vmapped RANSAC's device time."""
    return jnp.cumsum(valid.astype(jnp.int32))


def _sample_indices(key, valid, n_hyp, k, ranks=None):
    """Sample k point indices per hypothesis, uniform over valid entries.

    Sampling with replacement within a hypothesis is possible but harmless
    (degenerate minimal sets score ~0 inliers and lose the argmax).
    """
    if ranks is None:
        ranks = _valid_cumsum(valid)
    n_valid = ranks[-1]
    u = jax.random.uniform(key, (n_hyp, k))
    tgt = jnp.minimum((u * n_valid).astype(jnp.int32) + 1,
                      jnp.maximum(n_valid, 1))
    # index of the tgt-th valid entry = first position with rank == tgt
    # (clamped for the all-invalid case, where any model scores 0)
    idx = jnp.searchsorted(ranks, tgt.ravel()).reshape(n_hyp, k)
    return jnp.minimum(idx, valid.shape[0] - 1).astype(jnp.int32)


def _sample_from_subset(key, sub, n_valid, n_hyp, k):
    """Sample k point indices per hypothesis from a precomputed valid-point
    subset (_score_subset's evenly-spread selection).

    A direct n_hyp×k searchsorted over all N ranks was the single most
    expensive RANSAC stage on hardware (+15 ms per 64-pair batch, r3
    substage profile); drawing minimal sets from the ≥512-point spread is
    one tiny randint + gather, and the per-hypothesis all-inlier
    probability wᵏ is unchanged (the subset is an unbiased evenly-spaced
    selection over the valid entries — hardware recall sweep:
    scripts_dev/ransac_quality_sweep.py).

    Picks stay in [0, min(n_valid, m)): with fewer valid points than
    subset slots, _score_subset's tail slots hold a padding index, and
    drawing them would poison minimal sets (measured: a ~300-match pair
    loses RANSAC entirely at (n_valid/m)^4 hypothesis efficiency)."""
    hi = jnp.maximum(jnp.minimum(n_valid, sub.shape[0]), 1)
    pick = jax.random.randint(key, (n_hyp, k), 0, hi)
    return sub[pick]


def _minimal_sets_from_subset(key, tab_a, tab_b, n_valid, n_hyp, k):
    """Sample k-point minimal sets from the gathered subset TABLES and
    return their coordinates — (n_hyp·k, 2) each, hypothesis-major.

    Index picks are identical to _sample_from_subset (same randint), but
    the coordinate gather runs as a one-hot (n_hyp·k, m) f32 matmul on
    the MXU instead of n_hyp·k scattered loads from the (N, 2) arrays:
    flat gathers were the single biggest RANSAC slice on hardware
    (+3.2 ms per 64-pair batch) and poisoned the solve stage's fusion
    (+3.3 ms) — the matmul form runs the whole sample→score chain in
    ~2 ms (scripts_dev/ransac_gather_solve_probe.py). f32 one-hot is
    bit-exact: 0/1 factors and the HIGHEST-precision f32 dot reconstruct
    each coordinate losslessly, so results match the gather form bit for
    bit (and bf16 saves only 0.2 ms — scripts_dev/onehot_dtype_probe.py).
    """
    m = tab_a.shape[0]
    hi = jnp.maximum(jnp.minimum(n_valid, m), 1)
    pick = jax.random.randint(key, (n_hyp, k), 0, hi)
    oh = (pick.reshape(-1)[:, None]
          == jnp.arange(m, dtype=jnp.int32)[None, :]).astype(jnp.float32)
    return oh @ tab_a.astype(jnp.float32), oh @ tab_b.astype(jnp.float32)


def _score_subset(valid, ranks, max_points):
    """Fixed-size point subset for hypothesis SCORING.

    Evaluating all H hypotheses against all N points materializes
    (H, N, 3) transfer-error temps — tens of MB per pair that spill VMEM
    and made RANSAC ~60% of the matcher's device time (r3 profile:
    26 of 44 ms/batch). The argmax over hypotheses only needs a good
    inlier-count ESTIMATE: a ≥1k-point spread across the valid entries
    ranks hypotheses identically in practice; the refine/final-inlier
    passes still use every point. Returns (indices (m,), mask (m,)).

    Selection: the r-th valid entry (rank r) lands in rank stratum
    floor((r−1)·m/n_valid), so slot t's representative is the UNIQUE
    valid position with rank r_t = ceil(t·n_valid/m)+1 (or t+1 when
    n_valid < m and slots map 1:1). That uniqueness makes the pick a
    rank-equality one-hot matmul on the MXU — bit-identical to the
    previous scatter-min form but 3.7 → 1.7 ms per 64-pair batch with
    the normalization chain (scripts_dev/subset_matmul_probe.py; the
    scatter itself was 2.1 ms, and before that an m-target searchsorted
    cost 5.0). With n_valid < m the valid entries fill slots
    0..n_valid−1 and the tail is masked off."""
    n = valid.shape[0]
    m = min(max_points, n)
    n_valid = ranks[-1]
    t = jnp.arange(m, dtype=jnp.int32)
    r_t = jnp.where(n_valid >= m, (t * n_valid + m - 1) // m + 1, t + 1)
    oh = (valid[None, :]
          & (ranks[None, :] == r_t[:, None])).astype(jnp.float32)
    hit = oh @ jnp.arange(n, dtype=jnp.float32)
    got = oh @ jnp.ones((n,), jnp.float32)
    sub = jnp.where(got > 0, hit, float(n - 1)).astype(jnp.int32)
    sub_ok = t < n_valid
    return sub, sub_ok


def _normalize_2d(pts, valid):
    """Hartley normalization over the valid points: T s.t. T·pts has zero mean
    and RMS distance √2. Returns (pts_norm, T 3×3)."""
    w = valid.astype(pts.dtype)
    wsum = jnp.maximum(jnp.sum(w), 1.0)
    mean = jnp.sum(pts * w[:, None], axis=0) / wsum
    centered = (pts - mean) * w[:, None]
    rms = jnp.sqrt(jnp.sum(centered**2) / wsum + 1e-12)
    s = jnp.sqrt(2.0) / jnp.maximum(rms, 1e-8)
    T = jnp.array([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]], dtype=pts.dtype)
    T = T.at[0, 0].set(s).at[1, 1].set(s).at[0, 2].set(-s * mean[0]).at[1, 2].set(-s * mean[1])
    return (pts - mean) * s, T


def _similarity_inv(T):
    """Closed-form inverse of a Hartley transform [[s,0,tx],[0,s,ty],[0,0,1]].

    jnp.linalg.inv on batched 3×3 lowers to an LU path that compiles and
    runs pathologically on this stack; the structure makes it two scalar
    divides."""
    s = T[0, 0]
    inv_s = 1.0 / s
    Ti = jnp.array([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]],
                   dtype=T.dtype)
    return Ti.at[0, 0].set(inv_s).at[1, 1].set(inv_s) \
        .at[0, 2].set(-T[0, 2] * inv_s).at[1, 2].set(-T[1, 2] * inv_s)


def _gauss_solve(A, b):
    """Unrolled no-pivot Gaussian elimination, batched over leading dims.

    LU/eigh on thousands of tiny batched matrices is pathologically slow
    on TPU (per-matrix iterative lowering); unrolling the elimination
    turns each scalar step into one elementwise op over the whole
    hypothesis batch on the VPU. Inputs are Hartley-normalized so pivots
    are well-scaled; a singular system yields inf/nan and the hypothesis
    simply scores zero inliers."""
    n = A.shape[-1]
    Ab = jnp.concatenate([A, b[..., None]], axis=-1)
    rows = [Ab[..., i, :] for i in range(n)]
    for i in range(n):
        rows[i] = rows[i] / rows[i][..., i:i + 1]
        for j in range(i + 1, n):
            rows[j] = rows[j] - rows[j][..., i:i + 1] * rows[i]
    x = [None] * n
    for i in reversed(range(n)):
        acc = rows[i][..., n]
        for j in range(i + 1, n):
            acc = acc - rows[i][..., j] * x[j]
        x[i] = acc
    return jnp.stack(x, axis=-1)


def _smallest_eigvec(A, iters=3):
    """Null vector of Aᵀ A (A: (m, n)) via regularized inverse iteration.

    The target eigenvalue is ~0 (nullspace) while the rest are O(1) after
    Hartley normalization, so convergence takes one or two iterations;
    ε keeps the solve nonsingular on exact minimal data."""
    M = A.T @ A
    n = M.shape[-1]
    eps = 1e-6 * jnp.trace(M) / n + 1e-12
    Mr = M + eps * jnp.eye(n, dtype=M.dtype)
    # fixed non-structured start vector (an all-ones start can be near-
    # orthogonal to structured null vectors)
    v = jnp.sin(jnp.arange(1, n + 1, dtype=M.dtype) * 1.7)
    v = v / jnp.linalg.norm(v)
    for _ in range(iters):
        v = _gauss_solve(Mr, v)
        v = v / jnp.maximum(jnp.linalg.norm(v), 1e-20)
    return v


# ---------------------------------------------------------------------------
# Homography
# ---------------------------------------------------------------------------

def _homography_dlt(pa, pb, w=None):
    """Weighted DLT: H with pb ~ H·pa. pa/pb: (k, 2); w: (k,) weights."""
    k = pa.shape[0]
    if w is None:
        w = jnp.ones((k,), dtype=pa.dtype)
    x, y = pa[:, 0], pa[:, 1]
    u, v = pb[:, 0], pb[:, 1]
    zero = jnp.zeros_like(x)
    one = jnp.ones_like(x)
    r1 = jnp.stack([x, y, one, zero, zero, zero, -u * x, -u * y, -u], axis=-1)
    r2 = jnp.stack([zero, zero, zero, x, y, one, -v * x, -v * y, -v], axis=-1)
    A = jnp.concatenate([r1 * w[:, None], r2 * w[:, None]], axis=0)  # (2k, 9)
    h = _smallest_eigvec(A)
    return h.reshape(3, 3)


def _homography_4pt(pa, pb):
    """Exact minimal 4-point homography via an 8×8 solve with h₃₃ = 1.

    ~50× cheaper than the nullspace route on TPU (one batched LU solve vs
    an eigendecomposition per hypothesis). h₃₃ = 0 in normalized coords
    needs an extreme perspectivity — a degenerate/singular sample yields
    inf/nan entries and simply scores zero inliers in the argmax."""
    x, y = pa[:, 0], pa[:, 1]
    u, v = pb[:, 0], pb[:, 1]
    zero = jnp.zeros_like(x)
    one = jnp.ones_like(x)
    r1 = jnp.stack([x, y, one, zero, zero, zero, -u * x, -u * y], axis=-1)
    r2 = jnp.stack([zero, zero, zero, x, y, one, -v * x, -v * y], axis=-1)
    A = jnp.concatenate([r1, r2], axis=0)          # (8, 8)
    b = jnp.concatenate([u, v], axis=0)
    # normal equations: SPD system → pivot-free elimination is safe (a raw
    # DLT row can have a ~0 diagonal since normalized coords are zero-mean)
    h8 = _gauss_solve(A.T @ A, A.T @ b)
    return jnp.concatenate([h8, jnp.ones(1, A.dtype)]).reshape(3, 3)


def _adj3(c):
    """Adjugate of a 3×3 given as nested lists of (…,) scalars."""
    return [
        [c[1][1] * c[2][2] - c[1][2] * c[2][1],
         c[0][2] * c[2][1] - c[0][1] * c[2][2],
         c[0][1] * c[1][2] - c[0][2] * c[1][1]],
        [c[1][2] * c[2][0] - c[1][0] * c[2][2],
         c[0][0] * c[2][2] - c[0][2] * c[2][0],
         c[0][2] * c[1][0] - c[0][0] * c[1][2]],
        [c[1][0] * c[2][1] - c[1][1] * c[2][0],
         c[0][1] * c[2][0] - c[0][0] * c[2][1],
         c[0][0] * c[1][1] - c[0][1] * c[1][0]],
    ]


def _homography_4pt_batched(pa, pb):
    """Minimal 4-point homographies for a whole hypothesis batch in
    scalar-lane form: pa, pb (H, 4, 2) → (H, 3, 3) with pb ~ H·pa.

    Projective-basis method: with A = [λ₁p₁ λ₂p₂ λ₃p₃] where
    [p₁ p₂ p₃]·λ = p₄ (λ via the adjugate — the shared 1/det factor is a
    uniform scale and homographies are scale-free), A maps the canonical
    projective basis to the source quad and B likewise to the target, so
    H = B·adj(A). All arithmetic is unrolled Python over (H,) lanes: the
    previous (H, 8, 9) normal-equation solve tiled its trailing dims to
    (8, 128) and wasted >90% of the VPU (+10.7 ms per 64-pair batch,
    hardware substage profile). Degenerate samples (3 collinear / repeated
    points) produce a singular H that scores ~0 inliers, as before."""
    return _homography_4pt_scalar(
        [pa[..., i, 0] for i in range(4)], [pa[..., i, 1] for i in range(4)],
        [pb[..., i, 0] for i in range(4)], [pb[..., i, 1] for i in range(4)])


def _homography_4pt_scalar(x, y, u, v):
    """Projective-basis solve on length-4 lists of (…,) coordinate lanes
    (see _homography_4pt_batched; this entry lets callers feed flat scalar
    gathers and skip the (H, 4, 2) intermediate entirely)."""
    one = jnp.ones_like(x[0])

    def basis(xs, ys):
        c = [[xs[0], xs[1], xs[2]], [ys[0], ys[1], ys[2]], [one, one, one]]
        adj = _adj3(c)
        p4 = [xs[3], ys[3], one]
        lam = [sum(adj[i][j] * p4[j] for j in range(3)) for i in range(3)]
        return [[lam[j] * c[i][j] for j in range(3)] for i in range(3)]

    A = basis(x, y)
    B = basis(u, v)
    adjA = _adj3(A)
    H = [[sum(B[i][k] * adjA[k][j] for k in range(3)) for j in range(3)]
         for i in range(3)]
    return jnp.stack([jnp.stack(r, axis=-1) for r in H], axis=-2)


def _homography_error(H, pa, pb):
    """Forward transfer error ‖H·pa − pb‖ (cv2.findHomography's metric)."""
    ph = jnp.concatenate([pa, jnp.ones_like(pa[..., :1])], axis=-1)
    q = ph @ H.T
    z = q[..., 2]
    z = jnp.where(jnp.abs(z) < 1e-8, 1e-8, z)
    proj = q[..., :2] / z[..., None]
    return jnp.linalg.norm(proj - pb, axis=-1)


@functools.partial(jax.jit, static_argnames=("n_hyp", "refine_iters",
                                             "score_points"))
def ransac_homography(key, pts_a, pts_b, valid, thresh=3.0, n_hyp=512,
                      refine_iters=2, score_points=512):
    """RANSAC homography pts_a→pts_b. pts: (N,2) padded; valid: (N,) bool."""
    pa_n, Ta = _normalize_2d(pts_a, valid)
    pb_n, Tb = _normalize_2d(pts_b, valid)
    ranks = _valid_cumsum(valid)
    # score on a fixed subset (see _score_subset: full-N scoring was 60% of
    # the matcher's device time) and draw minimal sets from the same
    # subset (_sample_from_subset); refine + final inliers use every point
    sub, sub_ok = _score_subset(valid, ranks, score_points)
    pa_s, pb_s = pa_n[sub], pb_n[sub]
    ga, gb = _minimal_sets_from_subset(key, pa_s, pb_s, ranks[-1], n_hyp, 4)
    gx, gy = ga[:, 0], ga[:, 1]
    hx, hy = gb[:, 0], gb[:, 1]
    Hs = _homography_4pt_scalar(
        [gx[i::4] for i in range(4)], [gy[i::4] for i in range(4)],
        [hx[i::4] for i in range(4)], [hy[i::4] for i in range(4)])
    errs = jax.vmap(lambda H: _homography_error(H, pa_s, pb_s))(Hs)
    # threshold in normalized units: scale by Tb's isotropic scale
    t_norm = thresh * Tb[0, 0]
    scores = jnp.sum((errs < t_norm) & sub_ok[None, :], axis=1)
    best = jnp.argmax(scores)
    H_best = Hs[best]

    def refine(H, _):
        e = _homography_error(H, pa_n, pb_n)
        w = ((e < t_norm) & valid).astype(pts_a.dtype)
        H_new = _homography_dlt(pa_n, pb_n, w)
        return H_new, None

    H_ref, _ = jax.lax.scan(refine, H_best, None, length=refine_iters)
    err = _homography_error(H_ref, pa_n, pb_n)
    inl = (err < t_norm) & valid
    # denormalize: pb = Tb⁻¹ Ĥ Ta pa
    H_full = _similarity_inv(Tb) @ H_ref @ Ta
    H_full = H_full / jnp.where(jnp.abs(H_full[2, 2]) < 1e-12, 1.0, H_full[2, 2])
    n_inl = jnp.sum(inl)
    ok = (jnp.sum(valid) >= 4) & (n_inl >= 4)
    return RansacResult(H_full, inl, n_inl.astype(jnp.int32), ok)


# ---------------------------------------------------------------------------
# Fundamental / Essential
# ---------------------------------------------------------------------------

def _fundamental_8pt(pa, pb, w=None):
    """(Weighted) 8-point algorithm on pre-normalized coords; rank-2 enforced."""
    if w is None:
        w = jnp.ones(pa.shape[:1], dtype=pa.dtype)
    x, y = pa[:, 0], pa[:, 1]
    u, v = pb[:, 0], pb[:, 1]
    one = jnp.ones_like(x)
    A = jnp.stack([u * x, u * y, u, v * x, v * y, v, x, y, one], axis=-1)
    f = _smallest_eigvec(A * w[:, None])
    F = f.reshape(3, 3)
    U, S, Vt = jnp.linalg.svd(F)
    S = S.at[2].set(0.0)
    return (U * S[None, :]) @ Vt


def _epipolar_dist(F, pa, pb):
    """Symmetric epipolar distance (max of the two point-line distances)."""
    pha = jnp.concatenate([pa, jnp.ones_like(pa[..., :1])], axis=-1)
    phb = jnp.concatenate([pb, jnp.ones_like(pb[..., :1])], axis=-1)
    lb = pha @ F.T          # epipolar line in image b
    la = phb @ F            # epipolar line in image a
    num = jnp.abs(jnp.sum(phb * lb, axis=-1))
    db = num / jnp.maximum(jnp.linalg.norm(lb[..., :2], axis=-1), 1e-8)
    da = num / jnp.maximum(jnp.linalg.norm(la[..., :2], axis=-1), 1e-8)
    return jnp.maximum(da, db)


@functools.partial(jax.jit, static_argnames=("n_hyp", "refine_iters",
                                             "score_points"))
def ransac_fundamental(key, pts_a, pts_b, valid, thresh=3.0, n_hyp=512,
                       refine_iters=2, score_points=512):
    """RANSAC fundamental matrix (8-point hypotheses, symmetric epipolar
    distance scoring) — cv2.findFundamentalMat(FM_RANSAC) equivalent
    (reference matcher.py:124)."""
    pa_n, Ta = _normalize_2d(pts_a, valid)
    pb_n, Tb = _normalize_2d(pts_b, valid)
    ranks = _valid_cumsum(valid)
    sub, sub_ok = _score_subset(valid, ranks, score_points)
    pa_s, pb_s = pa_n[sub], pb_n[sub]
    ga, gb = _minimal_sets_from_subset(key, pa_s, pb_s, ranks[-1], n_hyp, 8)
    Fs = jax.vmap(_fundamental_8pt)(ga.reshape(n_hyp, 8, 2),
                                    gb.reshape(n_hyp, 8, 2))
    errs = jax.vmap(lambda F: _epipolar_dist(F, pa_s, pb_s))(Fs)
    t_norm = thresh * Tb[0, 0]
    scores = jnp.sum((errs < t_norm) & sub_ok[None, :], axis=1)
    best = jnp.argmax(scores)
    F_best = Fs[best]

    def refine(F, _):
        e = _epipolar_dist(F, pa_n, pb_n)
        w = ((e < t_norm) & valid).astype(pts_a.dtype)
        return _fundamental_8pt(pa_n, pb_n, w), None

    F_ref, _ = jax.lax.scan(refine, F_best, None, length=refine_iters)
    err = _epipolar_dist(F_ref, pa_n, pb_n)
    inl = (err < t_norm) & valid
    F_full = Tb.T @ F_ref @ Ta
    nrm = jnp.linalg.norm(F_full)
    F_full = F_full / jnp.where(nrm < 1e-12, 1.0, nrm)
    n_inl = jnp.sum(inl)
    ok = (jnp.sum(valid) >= 8) & (n_inl >= 8)
    return RansacResult(F_full, inl, n_inl.astype(jnp.int32), ok)


@functools.partial(jax.jit, static_argnames=("n_hyp", "refine_iters",
                                             "score_points"))
def ransac_essential(key, pts_a, pts_b, valid, K, thresh=1.0, n_hyp=512,
                     refine_iters=2, score_points=512):
    """RANSAC essential matrix — cv2.findEssentialMat equivalent (reference
    matcher.py:126).

    Uses normalized-8-point hypotheses (12 samples each for conditioning) with
    (1,1,0) singular-value projection rather than Nistér 5-point: with
    hundreds of batched hypotheses the minimal-solver difference washes out,
    and the 8-point solve is one batched eigendecomposition. Caveat: like all
    8-point variants this degrades on *planar* scenes (where E is ambiguous);
    for flat aerial terrain use the homography filter, which is the
    reference's default for exactly this reason (matcher.py:90-142).
    ``thresh`` is in pixels (divided by focal internally).
    """
    f = 0.5 * (K[0, 0] + K[1, 1])
    c = jnp.stack([K[0, 2], K[1, 2]])
    pa_n = (pts_a - c) / f
    pb_n = (pts_b - c) / f
    ranks = _valid_cumsum(valid)
    sub, sub_ok = _score_subset(valid, ranks, score_points)
    pa_s, pb_s = pa_n[sub], pb_n[sub]
    ga, gb = _minimal_sets_from_subset(key, pa_s, pb_s, ranks[-1], n_hyp, 12)

    def solve(pa_k, pb_k):
        E = _fundamental_8pt(pa_k, pb_k)
        U, S, Vt = jnp.linalg.svd(E)
        S = jnp.array([1.0, 1.0, 0.0], dtype=E.dtype)
        return (U * S[None, :]) @ Vt

    Es = jax.vmap(solve)(ga.reshape(n_hyp, 12, 2), gb.reshape(n_hyp, 12, 2))
    errs = jax.vmap(lambda E: _epipolar_dist(E, pa_s, pb_s))(Es)
    t_norm = thresh / f
    scores = jnp.sum((errs < t_norm) & sub_ok[None, :], axis=1)
    best = jnp.argmax(scores)
    E_best = Es[best]

    def refine(E, _):
        e = _epipolar_dist(E, pa_n, pb_n)
        w = ((e < t_norm) & valid).astype(pts_a.dtype)
        E2 = _fundamental_8pt(pa_n, pb_n, w)
        U, _, Vt = jnp.linalg.svd(E2)
        return (U * jnp.array([1.0, 1.0, 0.0])[None, :]) @ Vt, None

    E_ref, _ = jax.lax.scan(refine, E_best, None, length=refine_iters)
    err = _epipolar_dist(E_ref, pa_n, pb_n)
    inl = (err < t_norm) & valid
    n_inl = jnp.sum(inl)
    ok = (jnp.sum(valid) >= 8) & (n_inl >= 8)
    return RansacResult(E_ref, inl, n_inl.astype(jnp.int32), ok)


# ---------------------------------------------------------------------------
# 2-D similarity (estimateAffinePartial2D equivalent)
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("n_hyp", "refine_iters"))
def ransac_similarity_2d(key, pts_a, pts_b, valid, thresh=3.0, n_hyp=256,
                         refine_iters=2):
    """RANSAC 2-D similarity — cv2.estimateAffinePartial2D equivalent
    (reference smart.py:87 find_affine)."""
    from ..core.transforms import fit_similarity_2d

    idx = _sample_indices(key, valid, n_hyp, 2)

    def solve(i):
        return fit_similarity_2d(pts_a[i], pts_b[i])

    As = jax.vmap(solve)(idx)  # (H, 2, 3)

    def err_fn(A):
        pred = pts_a @ A[:, :2].T + A[:, 2]
        return jnp.linalg.norm(pred - pts_b, axis=-1)

    errs = jax.vmap(err_fn)(As)
    scores = jnp.sum((errs < thresh) & valid[None, :], axis=1)
    best = jnp.argmax(scores)
    A_best = As[best]

    def refine(A, _):
        e = err_fn(A)
        w = ((e < thresh) & valid).astype(pts_a.dtype)
        return fit_similarity_2d(pts_a, pts_b, w), None

    A_ref, _ = jax.lax.scan(refine, A_best, None, length=refine_iters)
    err = err_fn(A_ref)
    inl = (err < thresh) & valid
    n_inl = jnp.sum(inl)
    ok = (jnp.sum(valid) >= 2) & (n_inl >= 2)
    return RansacResult(A_ref, inl, n_inl.astype(jnp.int32), ok)
