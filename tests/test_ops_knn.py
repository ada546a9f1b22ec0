import numpy as np
import jax
import jax.numpy as jnp
import pytest

from imageanalysis_tpu.ops import knn

cv2 = pytest.importorskip("cv2")


def make_descs(rng, na, nb, d=128, overlap=100):
    """Two descriptor sets sharing `overlap` near-identical rows."""
    a = rng.uniform(0, 400, size=(na, d)).astype(np.float32)
    b = rng.uniform(0, 400, size=(nb, d)).astype(np.float32)
    b[:overlap] = a[:overlap] + rng.normal(0, 2.0, size=(overlap, d))
    return a, b


def test_knn_ref_vs_bruteforce(rng):
    a, b = make_descs(rng, 64, 96, d=16, overlap=20)
    row_d, row_i, col_d, col_i = knn.knn_top2_ref(jnp.asarray(a), jnp.asarray(b), bf16=False)
    d2 = ((a[:, None, :] - b[None, :, :]) ** 2).sum(-1)
    np.testing.assert_array_equal(np.asarray(row_i)[:, 0], d2.argmin(1))
    np.testing.assert_array_equal(np.asarray(col_i), d2.argmin(0))
    # ‖a‖²+‖b‖²−2ab in f32 carries ~1e-7·‖·‖² cancellation error — indices
    # are what matters; distances only feed the ratio test
    np.testing.assert_allclose(np.asarray(row_d)[:, 0], d2.min(1), rtol=1e-2, atol=2.0)
    order = np.argsort(d2, axis=1)
    np.testing.assert_array_equal(np.asarray(row_i)[:, 1], order[:, 1])


def _indices_equal_modulo_ties(i_p, i_r, d_full, rtol=2.0 ** -9):
    """Exact index equality except where the competing distances tie within
    the packed kernel's 13-bit mantissa truncation (ratio/mutual tests are
    insensitive to which of two equal-distance neighbors wins)."""
    i_p = np.asarray(i_p)
    i_r = np.asarray(i_r)
    rows = np.arange(len(i_p))
    for col in range(i_p.shape[1]) if i_p.ndim == 2 else [None]:
        p = i_p[:, col] if col is not None else i_p
        r = i_r[:, col] if col is not None else i_r
        bad = np.nonzero(p != r)[0]
        for rr in bad:
            dp = d_full[rr, p[rr]]
            dr = d_full[rr, r[rr]]
            assert abs(dp - dr) <= rtol * max(abs(dr), 1e-6), (rr, dp, dr)
    return True


def test_knn_pallas_matches_ref(rng):
    a, b = make_descs(rng, 512, 1024, d=128, overlap=128)
    ja, jb = jnp.asarray(a), jnp.asarray(b)
    rd_p, ri_p, cd_p, ci_p = knn.knn_top2(ja, jb, tile_a=256, tile_b=512, bf16=False)
    rd_r, ri_r, cd_r, ci_r = knn.knn_top2_ref(ja, jb, bf16=False)
    d2 = (np.sum(a.astype(np.float64) ** 2, 1)[:, None]
          + np.sum(b.astype(np.float64) ** 2, 1)[None, :]
          - 2.0 * a.astype(np.float64) @ b.astype(np.float64).T)
    _indices_equal_modulo_ties(ri_p, ri_r, d2)
    _indices_equal_modulo_ties(np.asarray(ci_p)[:, None],
                               np.asarray(ci_r)[:, None], d2.T)
    np.testing.assert_allclose(np.asarray(rd_p), np.asarray(rd_r),
                               rtol=2.0 ** -9, atol=1e-2)


def test_match_pair_dense_vs_cv2(rng):
    a, b = make_descs(rng, 300, 400, d=128, overlap=150)
    na_pad, nb_pad = 512, 512
    pa = knn.pad_descriptors(jnp.asarray(a), na_pad)
    pb = knn.pad_descriptors(jnp.asarray(b), nb_pad)
    best_j, ok = knn.match_pair_dense(pa, pb, 300, 400, ratio=0.75, mutual=True, bf16=False)
    best_j, ok = np.asarray(best_j), np.asarray(ok)

    bf = cv2.BFMatcher(cv2.NORM_L2)
    raw = bf.knnMatch(a, b, k=2)
    cv_matches = {}
    rev = bf.match(b, a)  # best a for each b
    rev_best = {m.queryIdx: m.trainIdx for m in rev}
    for m, n in raw:
        if m.distance < 0.75 * n.distance and rev_best.get(m.trainIdx) == m.queryIdx:
            cv_matches[m.queryIdx] = m.trainIdx

    ours = {i: int(best_j[i]) for i in range(300) if ok[i]}
    # identical exact computation → identical match sets
    assert ours == cv_matches
    assert len(ours) >= 100  # the planted overlap survives


def test_padded_rows_never_match(rng):
    a, b = make_descs(rng, 100, 120, d=32, overlap=50)
    pa = knn.pad_descriptors(jnp.asarray(a), 128)
    pb = knn.pad_descriptors(jnp.asarray(b), 128)
    best_j, ok = knn.match_pair_dense(pa, pb, 100, 120, bf16=False)
    ok = np.asarray(ok)
    assert not ok[100:].any()
    assert np.all(np.asarray(best_j)[ok] < 120)


def test_match_pair_dense_uv_b_fused_gather(rng):
    """uv_b= returns pb = uv_b[best_j] (rides the mutual-check one-hot
    matmul on TPU; plain gather elsewhere) — must equal the 2-tuple form
    plus an explicit take_along_axis, bit for bit."""
    a, b = make_descs(rng, 300, 400, overlap=150)
    pa = knn.pad_descriptors(jnp.asarray(a), 512)
    pb = knn.pad_descriptors(jnp.asarray(b), 512)
    uv_b = jnp.asarray(rng.uniform(0, 4000, (512, 2)).astype(np.float32))
    bj2, ok2 = knn.match_pair_dense(pa, pb, 300, 400, bf16=False)
    bj3, ok3, puv = knn.match_pair_dense(pa, pb, 300, 400, bf16=False,
                                         uv_b=uv_b)
    assert np.array_equal(np.asarray(bj2), np.asarray(bj3))
    assert np.array_equal(np.asarray(ok2), np.asarray(ok3))
    expect = np.asarray(jnp.take_along_axis(uv_b, bj2[:, None], axis=0))
    np.testing.assert_array_equal(np.asarray(puv), expect)


def test_knn_int8_matches_f32_oracle(rng):
    """The int8-MXU packed kernel path (uint8 SIFT descriptors stored as
    value−128) computes EXACT integer distances: indices must match the f32
    oracle and decoded distances must agree to the 13-bit packing
    truncation."""
    a8 = rng.integers(0, 256, (512, 128)).astype(np.uint8)
    b8 = rng.integers(0, 256, (768, 128)).astype(np.uint8)
    b8[:100] = np.clip(a8[:100].astype(int)
                       + rng.integers(-3, 4, (100, 128)), 0, 255)
    ai = jnp.asarray((a8.astype(np.int16) - 128).astype(np.int8))
    bi = jnp.asarray((b8.astype(np.int16) - 128).astype(np.int8))
    af = jnp.asarray(a8.astype(np.float32))
    bf_ = jnp.asarray(b8.astype(np.float32))
    rd_i, ri_i, cd_i, ci_i = knn.knn_top2(ai, bi)
    rd_r, ri_r, cd_r, ci_r = knn.knn_top2_ref(af, bf_, bf16=False)
    d2 = (np.sum(a8.astype(np.float64) ** 2, 1)[:, None]
          + np.sum(b8.astype(np.float64) ** 2, 1)[None, :]
          - 2.0 * a8.astype(np.float64) @ b8.astype(np.float64).T)
    _indices_equal_modulo_ties(ri_i, ri_r, d2)
    _indices_equal_modulo_ties(np.asarray(ci_i)[:, None],
                               np.asarray(ci_r)[:, None], d2.T)
    np.testing.assert_allclose(np.asarray(rd_i), np.asarray(rd_r),
                               rtol=2.0 ** -9, atol=1e-2)
    # the int8 path threads through match_pair_dense unchanged
    bj_i, ok_i = knn.match_pair_dense(ai, bi, 512, 768)
    bj_f, ok_f = knn.match_pair_dense(af, bf_, 512, 768, bf16=False)
    agree = np.asarray(ok_i) == np.asarray(ok_f)
    assert np.mean(agree) > 0.98  # ratio-test edge ties only
    both = np.asarray(ok_i) & np.asarray(ok_f)
    assert np.array_equal(np.asarray(bj_i)[both], np.asarray(bj_f)[both])


def test_knn_match_fused_matches_unfused(rng):
    """_knn_kernel_fused (in-kernel ratio/mutual/uv-pick epilogue) must
    reproduce the decode + one-hot epilogue of match_pair_dense exactly:
    same survivors, same best indices, same picked coords."""
    a, b = make_descs(rng, 300, 400, d=128, overlap=150)
    pa = knn.pad_descriptors(jnp.asarray(a), 512)
    pb = knn.pad_descriptors(jnp.asarray(b), 512)
    uv_b = jnp.asarray(rng.uniform(0, 4000, (512, 2)).astype(np.float32))
    bj_u, ok_u, pb_u = knn.match_pair_dense(pa, pb, 300, 400, bf16=True,
                                            use_pallas=False, uv_b=uv_b)
    bj_f, ok_f, pb_f = knn.knn_match_fused(pa, pb, uv_b, ratio=0.75)
    ok_f = np.asarray(ok_f) & (np.arange(512) < 300) & (np.asarray(bj_f) < 400)
    # unfused uses the unpacked f32 kernel; fused packs 13 index bits into
    # the mantissa — survivors may differ only on ratio-test edge ties
    ok_u = np.asarray(ok_u)
    agree = ok_u == ok_f
    assert agree.mean() > 0.99, agree.mean()
    both = ok_u & ok_f
    assert both.sum() > 100
    np.testing.assert_array_equal(np.asarray(bj_f)[both],
                                  np.asarray(bj_u)[both])
    np.testing.assert_array_equal(np.asarray(pb_f)[both],
                                  np.asarray(pb_u)[both])


def test_knn_match_fused_packed_exact(rng):
    """Against the packed-kernel unfused path (int8: identical truncated
    distances on both sides) the fused epilogue must be bit-identical."""
    a8 = rng.integers(0, 256, (512, 128)).astype(np.uint8)
    b8 = rng.integers(0, 256, (640, 128)).astype(np.uint8)
    b8[:200] = np.clip(a8[:200].astype(int)
                       + rng.integers(-3, 4, (200, 128)), 0, 255)
    ai = jnp.asarray((a8.astype(np.int16) - 128).astype(np.int8))
    bi = jnp.asarray((b8.astype(np.int16) - 128).astype(np.int8))
    uv_b = jnp.asarray(rng.uniform(0, 4000, (640, 2)).astype(np.float32))
    # unfused packed path: knn_top2 decode + epilogue by hand
    row_d, row_i, col_d, col_i = knn.knn_top2(ai, bi)
    best_j = np.asarray(row_i)[:, 0]
    d1 = np.maximum(np.asarray(row_d)[:, 0], 0.0)
    d2 = np.maximum(np.asarray(row_d)[:, 1], 0.0)
    ok_u = (d1 < 0.75 ** 2 * d2) & (np.asarray(col_i)[best_j]
                                    == np.arange(512))
    bj_f, ok_f, pb_f = knn.knn_match_fused(ai, bi, uv_b, ratio=0.75)
    np.testing.assert_array_equal(np.asarray(bj_f), best_j)
    np.testing.assert_array_equal(np.asarray(ok_f), ok_u)
    expect_uv = np.asarray(uv_b)[best_j]
    np.testing.assert_array_equal(np.asarray(pb_f), expect_uv)


def test_knn_match_fused_gated(rng):
    """Fused epilogue + spatial gating: same twin-disambiguation behavior
    as the gated packed kernel."""
    n, d = 256, 128
    base = rng.integers(0, 200, (n // 2, d))
    noise = lambda: rng.integers(-2, 3, (n // 2, d))
    a8 = np.clip(np.concatenate([base + noise(), base + noise()]), 0, 255)
    b8 = np.clip(np.concatenate([base + noise(), base + noise()]), 0, 255)
    ai = jnp.asarray((a8 - 128).astype(np.int8))
    bi = jnp.asarray((b8 - 128).astype(np.int8))
    uv_a = np.zeros((n, 2), np.float32)
    uv_a[:, 0] = 100.0 + 500.0 * (np.arange(n) >= n // 2)
    uv_a[:, 1] = np.tile(np.arange(n // 2) * 3.0, 2)
    uv_b = jnp.asarray(uv_a + 1.0)
    bj, ok, pb = knn.knn_match_fused(ai, bi, uv_b, ratio=0.75,
                                     gate_uv_a=jnp.asarray(uv_a),
                                     gate_pred_b=jnp.asarray(uv_a),
                                     gate_radius=50.0)
    bj, ok = np.asarray(bj), np.asarray(ok)
    assert ok.sum() > 0.9 * n
    assert np.array_equal(bj[ok], np.arange(n)[ok])
    np.testing.assert_array_equal(np.asarray(pb)[ok], np.asarray(uv_b)[ok])


def test_knn_gated_disambiguates_twins(rng):
    """Spatial gating: plant TWIN descriptor pairs (identical up to noise)
    so the ratio test alone rejects every match; the position prior must
    disambiguate and recover the true correspondences — the smart-strategy
    repetitive-texture mechanism at kernel level."""
    n, d = 256, 128
    base = rng.integers(0, 200, (n // 2, d))
    noise = lambda: rng.integers(-2, 3, (n // 2, d))
    a8 = np.clip(np.concatenate([base + noise(), base + noise()]), 0, 255)
    b8 = np.clip(np.concatenate([base + noise(), base + noise()]), 0, 255)
    ai = jnp.asarray((a8 - 128).astype(np.int8))
    bi = jnp.asarray((b8 - 128).astype(np.int8))
    # geometry: copy k sits at x = 100 + 500·(k // half); b's predicted
    # position in a equals a's true position (perfect prior)
    uv_a = np.zeros((n, 2), np.float32)
    uv_a[:, 0] = 100.0 + 500.0 * (np.arange(n) >= n // 2)
    uv_a[:, 1] = np.tile(np.arange(n // 2) * 3.0, 2)
    pred_b = uv_a.copy()

    # ungated: twins make d1 ≈ d2 → ratio test kills (almost) everything
    _, ok_plain = knn.match_pair_dense(ai, bi, n, n)
    assert np.asarray(ok_plain).sum() < 0.1 * n

    # gated at 50 px (twins are 500 px apart): full recovery
    bj, ok = knn.match_pair_dense(ai, bi, n, n, gate_uv_a=jnp.asarray(uv_a),
                                  gate_pred_b=jnp.asarray(pred_b),
                                  gate_radius=50.0)
    bj, ok = np.asarray(bj), np.asarray(ok)
    assert ok.sum() > 0.9 * n
    assert np.array_equal(bj[ok], np.arange(n)[ok])

    # pallas and ref gated paths agree
    bj_r, ok_r = knn.match_pair_dense(ai, bi, n, n, use_pallas=False,
                                      gate_uv_a=jnp.asarray(uv_a),
                                      gate_pred_b=jnp.asarray(pred_b),
                                      gate_radius=50.0)
    assert np.array_equal(ok, np.asarray(ok_r))
    assert np.array_equal(bj[ok], np.asarray(bj_r)[ok])
