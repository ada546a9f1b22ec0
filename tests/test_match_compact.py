"""Device-side match-result compaction (matcher._compact_packed).

The store loop's critical path on tunneled runtimes is the per-batch
download of the (B, npad) packed match array; compaction downloads a
[counts | row<<13|col] vector ~4× smaller. These tests pin the pack/unpack
round trip against the full-array unpack on identical inputs, including
dummy padding pairs and the overflow fallback contract.
"""

import numpy as np
import pytest

from imageanalysis_tpu.match import matcher


class _FakeImage:
    def __init__(self, name):
        self.name = name
        self.match_list = {}
        self.matches_clean = True


def _random_packed(rng, B, npad, p_match=0.1):
    packed = np.full((B, npad), -1, np.int16)
    m = rng.random((B, npad)) < p_match
    packed[m] = rng.integers(0, npad, m.sum(), dtype=np.int16)
    return packed


def _run_both(packed, n_real, cap, min_pairs=1):
    imgs_a = [_FakeImage(f"a{i}") for i in range(n_real)]
    imgs_b = [_FakeImage(f"b{i}") for i in range(n_real)]
    images = imgs_a + imgs_b
    chunk = [(i, n_real + i) for i in range(n_real)]

    n_full = matcher._store_unpack(images, chunk, packed, min_pairs)
    full = {(im.name, k): v for im in images for k, v in im.match_list.items()}
    for im in images:
        im.match_list = {}

    buf = np.asarray(matcher._compact_packed(packed, n_real, cap))
    counts, entries = buf[: packed.shape[0]], buf[packed.shape[0]:]
    assert len(entries) == cap
    total = int(counts[:n_real].sum())
    n_comp = matcher._store_unpack_compact(images, chunk, counts, entries,
                                           min_pairs)
    comp = {(im.name, k): v for im in images for k, v in im.match_list.items()}
    return n_full, full, n_comp, comp, total


def _assert_same_matches(full, comp):
    assert set(full) == set(comp)
    for k in full:
        np.testing.assert_array_equal(np.asarray(full[k]),
                                      np.asarray(comp[k]))


def test_compact_roundtrip_matches_full_unpack():
    rng = np.random.default_rng(0)
    B, npad = 8, 512
    packed = _random_packed(rng, B, npad)
    n_full, full, n_comp, comp, total = _run_both(packed, B, cap=B * npad)
    assert total <= B * npad
    assert n_comp == n_full
    _assert_same_matches(full, comp)


def test_compact_masks_dummy_padding_pairs():
    """Padding slots (index ≥ n_real) self-match heavily; compaction must
    exclude them or they flood the cap."""
    rng = np.random.default_rng(1)
    B, npad, n_real = 8, 256, 3
    packed = _random_packed(rng, B, npad, p_match=0.5)
    buf = np.asarray(matcher._compact_packed(packed, n_real, B * npad))
    counts = buf[:B]
    assert counts[n_real:].sum() == 0
    expect = (packed[:n_real] >= 0).sum()
    assert counts[:n_real].sum() == expect


def test_compact_overflow_detected_by_counts():
    """counts records TRUE totals even when entries overflow the cap, so the
    host can detect truncation and fall back to the full download."""
    rng = np.random.default_rng(2)
    B, npad = 4, 256
    packed = _random_packed(rng, B, npad, p_match=0.9)
    cap = 32
    buf = np.asarray(matcher._compact_packed(packed, B, cap))
    counts, entries = buf[:B], buf[B:]
    assert len(entries) == cap
    assert int(counts.sum()) == int((packed >= 0).sum())
    assert int(counts.sum()) > cap   # the fallback trigger

    # the un-truncated prefix is still exact: first cap entries in
    # pair-major order
    rows_all, cols_all = [], []
    for b in range(B):
        r = np.nonzero(packed[b] >= 0)[0]
        rows_all.extend(r)
        cols_all.extend(packed[b][r])
    rows_all = np.asarray(rows_all[:cap])
    cols_all = np.asarray(cols_all[:cap], np.int64)
    assert np.array_equal(entries >> matcher._COMPACT_BITS, rows_all)
    assert np.array_equal(entries & ((1 << matcher._COMPACT_BITS) - 1),
                          cols_all)


def test_compact_min_pairs_still_applies():
    rng = np.random.default_rng(3)
    B, npad = 4, 256
    packed = _random_packed(rng, B, npad, p_match=0.05)
    n_full, full, n_comp, comp, _ = _run_both(packed, B, cap=B * npad,
                                              min_pairs=10)
    assert n_comp == n_full
    _assert_same_matches(full, comp)


@pytest.mark.parametrize("n_real", [1, 5, 8])
def test_compact_partial_chunks(n_real):
    rng = np.random.default_rng(4)
    B, npad = 8, 128
    packed = _random_packed(rng, B, npad, p_match=0.2)
    n_full, full, n_comp, comp, _ = _run_both(
        packed[:, :], n_real, cap=B * npad)
    assert n_comp == n_full
    _assert_same_matches(full, comp)
