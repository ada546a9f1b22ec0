"""Mission/bench-shape on-chip checks (n=6144, d=128, int8 store
convention) — the exact shapes the 2812-image mission and bench.py drive
through the packed kernel. Smaller-shape parity lives in
test_kernels_tpu; this file pins the production configuration, where
tile heuristics pick the full-B tile and the one-hot gather branch."""

import numpy as np
import jax
import jax.numpy as jnp

from imageanalysis_tpu.ops import knn

N, D, N_REAL = 6144, 128, 6000


def _bench_pair(seed=0):
    rng = np.random.default_rng(seed)
    da = rng.integers(0, 100, (N, D)).astype(np.float32)
    db = rng.integers(0, 100, (N, D)).astype(np.float32)
    db[:1500] = np.clip(np.round(da[:1500] + rng.normal(0, 4, (1500, D))),
                        0, 255)
    da[N_REAL:] = 255.0
    db[N_REAL:] = 255.0
    uv_b = rng.uniform(0, 4000, (N, 2)).astype(np.float32)
    return da, db, uv_b


def test_packed_kernel_mission_shape_vs_oracle():
    """Top-1 indices at the full bench shape must match an exact f64 host
    oracle (modulo 13-bit-truncation ties)."""
    da, db, _ = _bench_pair()
    ai = jnp.asarray((da - 128).astype(np.int8))
    bi = jnp.asarray((db - 128).astype(np.int8))
    rd, ri, cd, ci = map(np.asarray, knn.knn_top2(ai, bi))
    d2 = (np.sum(da.astype(np.float64) ** 2, 1)[:, None]
          + np.sum(db.astype(np.float64) ** 2, 1)[None, :]
          - 2.0 * da.astype(np.float64) @ db.astype(np.float64).T)
    best = d2.argmin(1)
    bad = np.nonzero(ri[:, 0] != best)[0]
    for r in bad:  # only truncation ties may disagree
        assert abs(d2[r, ri[r, 0]] - d2[r, best[r]]) \
            <= 2.0 ** -9 * max(d2[r, best[r]], 1e-6)
    # planted correspondences must be found
    assert np.mean(ri[:1500, 0] == np.arange(1500)) > 0.999


def test_fused_equals_unfused_mission_shape():
    """best_j / ok / picked-uv from the two-launch fused path must be
    bit-identical to the packed-kernel decode + epilogue at mission shape
    (the scripts_dev/fused_parity_tpu.py probe, as a committed test)."""
    da, db, uv_b = _bench_pair()
    ai = jnp.asarray((da - 128).astype(np.int8))
    bi = jnp.asarray((db - 128).astype(np.int8))
    uvb = jnp.asarray(uv_b)

    bj_f, ok_f, pb_f = map(np.asarray,
                           knn.knn_match_fused(ai, bi, uvb, ratio=0.75))
    rd, ri, cd, ci = map(np.asarray, knn.knn_top2(ai, bi))
    best_j = ri[:, 0]
    d1 = np.maximum(rd[:, 0], 0.0)
    d2v = np.maximum(rd[:, 1], 0.0)
    ok_u = (d1 < 0.75 ** 2 * d2v) & (ci[best_j] == np.arange(N))
    np.testing.assert_array_equal(bj_f, best_j)
    np.testing.assert_array_equal(ok_f, ok_u)
    np.testing.assert_array_equal(pb_f[ok_u], uv_b[best_j][ok_u])


def test_match_pair_dense_tpu_gather_branch():
    """The TPU-only factored one-hot gather (mutual + uv pick) must equal
    the plain-gather reference path at mission shape."""
    da, db, uv_b = _bench_pair(1)
    ai = jnp.asarray((da - 128).astype(np.int8))
    bi = jnp.asarray((db - 128).astype(np.int8))
    uvb = jnp.asarray(uv_b)
    bj_t, ok_t, pb_t = map(np.asarray, knn.match_pair_dense(
        ai, bi, N_REAL, N_REAL, ratio=0.75, use_pallas=True, uv_b=uvb))
    rd, ri, cd, ci = map(np.asarray, knn.knn_top2(ai, bi))
    best_j = ri[:, 0]
    d1 = np.maximum(rd[:, 0], 0.0)
    d2v = np.maximum(rd[:, 1], 0.0)
    ok_u = (d1 < 0.75 ** 2 * d2v) & (ci[best_j] == np.arange(N))
    ok_u &= (np.arange(N) < N_REAL) & (best_j < N_REAL)
    np.testing.assert_array_equal(bj_t, best_j)
    np.testing.assert_array_equal(ok_t, ok_u)
    np.testing.assert_array_equal(pb_t[ok_u], uv_b[best_j][ok_u])


def test_gated_kernel_mission_shape():
    """Spatial gating at mission shape: a 40 px prior radius recovers
    planted matches whose descriptors have far-away twins."""
    rng = np.random.default_rng(2)
    half = 2000
    base = rng.integers(0, 200, (half, D))
    mk = lambda: np.clip(base + rng.integers(-2, 3, (half, D)), 0, 255)
    da = np.full((N, D), 255.0, np.float32)
    db = np.full((N, D), 255.0, np.float32)
    da[:half], da[half:2 * half] = mk(), mk()
    db[:half], db[half:2 * half] = mk(), mk()
    uv_a = np.zeros((N, 2), np.float32)
    uv_a[:2 * half, 0] = 100.0 + 2000.0 * (np.arange(2 * half) >= half)
    uv_a[:2 * half, 1] = np.tile(np.arange(half) * 1.7, 2)
    ai = jnp.asarray((da - 128).astype(np.int8))
    bi = jnp.asarray((db - 128).astype(np.int8))
    bj, ok = knn.match_pair_dense(
        ai, bi, 2 * half, 2 * half, gate_uv_a=jnp.asarray(uv_a),
        gate_pred_b=jnp.asarray(uv_a), gate_radius=40.0)
    bj, ok = np.asarray(bj), np.asarray(ok)
    assert ok[:2 * half].sum() > 0.9 * 2 * half
    assert np.array_equal(bj[ok], np.nonzero(ok)[0])
