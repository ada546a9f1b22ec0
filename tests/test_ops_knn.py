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


def test_knn_pallas_matches_ref(rng):
    a, b = make_descs(rng, 512, 1024, d=128, overlap=128)
    ja, jb = jnp.asarray(a), jnp.asarray(b)
    rd_p, ri_p, cd_p, ci_p = knn.knn_top2(ja, jb, tile_a=256, tile_b=512, bf16=False)
    rd_r, ri_r, cd_r, ci_r = knn.knn_top2_ref(ja, jb, bf16=False)
    np.testing.assert_array_equal(np.asarray(ri_p), np.asarray(ri_r))
    np.testing.assert_array_equal(np.asarray(ci_p), np.asarray(ci_r))
    np.testing.assert_allclose(np.asarray(rd_p), np.asarray(rd_r), rtol=1e-5, atol=1e-2)


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
