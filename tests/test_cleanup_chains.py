"""cleanup.link_matches / triangulate_ground: flat-array fast path.

link_matches attaches flat observation arrays (chain-major, final order) to
its MatchList; triangulate_ground must produce identical chain positions
whether it consumes those arrays or re-flattens the Python lists — and must
detect stale arrays after a chain mutation (culls edit chains in place).
"""

import copy
import pickle

import numpy as np
import pytest

from imageanalysis_tpu.match import cleanup


class _Img:
    def __init__(self, name, kp, ned=(0.0, 0.0, -100.0)):
        self.name = name
        self.kp = np.asarray(kp, np.float32)
        self.match_list = {}
        self._ned = np.asarray(ned, np.float64)

    def load_features(self):
        return True

    def load_matches(self):
        return True

    def get_camera_pose(self, opt=False):
        # nadir: body x=north, z=down
        return self._ned, None, np.array([1.0, 0.0, 0.0, 0.0])


class _Cam:
    K = np.array([[400.0, 0, 320], [0, 400.0, 240], [0, 0, 1]], np.float32)
    dist = np.zeros(5, np.float32)


class _Proj:
    def __init__(self, images):
        self.image_list = images

    def camera_model(self, optimized=False):
        return _Cam()

    def ned_reference_lla(self):
        return (45.0, -93.0, 0.0)


def _make_proj(rng, n_img=5, n_kp=30):
    imgs = [_Img(f"im{i}", rng.uniform(0, 600, (n_kp, 2)),
                 ned=(10.0 * i, 5.0 * i, -100.0)) for i in range(n_img)]
    # chain kp k across consecutive images: match (i,k) <-> (i+1,k)
    for i in range(n_img - 1):
        pairs = [[k, k] for k in range(n_kp) if (k + i) % 3 != 0]
        imgs[i].match_list[imgs[i + 1].name] = pairs
        imgs[i + 1].match_list[imgs[i].name] = [[b, a] for a, b in pairs]
    return _Proj(imgs)


def test_link_attaches_consistent_flat_arrays():
    proj = _make_proj(np.random.default_rng(0))
    matches = cleanup.link_matches(proj)
    assert isinstance(matches, cleanup.MatchList)
    total = sum(len(m) - 2 for m in matches)
    assert len(matches.obs_img) == total == len(matches.obs_uv) \
        == len(matches.obs_match)
    # arrays are chain-major in final (longest-first) list order
    k = 0
    for mi, m in enumerate(matches):
        for img, uv in m[2:]:
            assert matches.obs_img[k] == img
            assert np.allclose(matches.obs_uv[k], uv)
            assert matches.obs_match[k] == mi
            k += 1
    # longest-first ordering held
    lens = [len(m) for m in matches]
    assert lens == sorted(lens, reverse=True)


def test_matchlist_pickles_as_plain_list():
    proj = _make_proj(np.random.default_rng(1))
    matches = cleanup.link_matches(proj)
    back = pickle.loads(pickle.dumps(matches))
    assert type(back) is list
    assert back == list(matches)


def test_triangulate_flat_path_equals_flatten_path():
    proj = _make_proj(np.random.default_rng(2))
    matches = cleanup.link_matches(proj)
    # deepcopy reduces to a plain list (same as pickle); rebuild a MatchList
    m_flat = cleanup.MatchList(copy.deepcopy(list(matches)))
    m_flat.obs_img = matches.obs_img
    m_flat.obs_uv = matches.obs_uv
    m_flat.obs_match = matches.obs_match
    m_slow = pickle.loads(pickle.dumps(matches))   # plain list, no arrays

    cleanup.triangulate_ground(proj, m_flat)
    cleanup.triangulate_ground(proj, m_slow)
    assert len(m_flat) == len(m_slow)
    for a, b in zip(m_flat, m_slow):
        assert a[0] is not None and b[0] is not None
        assert np.allclose(a[0], b[0], atol=1e-5)
        assert np.isfinite(a[0]).all()


def test_triangulate_detects_stale_arrays():
    proj = _make_proj(np.random.default_rng(3))
    matches = cleanup.link_matches(proj)
    # cull-style mutation: drop one observation from the longest chain
    assert len(matches[0]) > 3
    del matches[0][2]
    oracle = pickle.loads(pickle.dumps(matches))
    cleanup.triangulate_ground(proj, matches)   # must NOT use stale arrays
    cleanup.triangulate_ground(proj, oracle)
    for a, b in zip(matches, oracle):
        assert np.allclose(a[0], b[0], atol=1e-5)


def _assert_setup_equal(fast, slow):
    fc, fp, fo, fn, fm = fast
    sc, sp, so, sn, sm = slow
    assert fn == sn
    for a, b in ((fc, sc), (fp, sp), (fm, sm),
                 (fo.cam_idx, so.cam_idx), (fo.pt_idx, so.pt_idx),
                 (fo.uv, so.uv), (fo.weight, so.weight)):
        a, b = np.asarray(a), np.asarray(b)
        assert a.shape == b.shape
        assert np.allclose(a.astype(np.float64), b.astype(np.float64))


def test_ba_setup_flat_path_equals_loop_path():
    """setup_from_matches' array-at-a-time assembly must replicate the
    per-observation loop exactly: same observation order, same
    min_chain_len/None-point skips, same group filtering."""
    from imageanalysis_tpu.ba import setup as ba_setup

    proj = _make_proj(np.random.default_rng(4), n_img=6, n_kp=24)
    for im in proj.image_list:
        im.has_opt_pose = lambda: False
    matches = cleanup.link_matches(proj)
    cleanup.triangulate_ground(proj, matches)
    # a couple of untriangulated chains exercise the None-point skip
    matches[1][0] = None
    matches[-2][0] = None

    m_slow = pickle.loads(pickle.dumps(matches))   # plain list, no arrays
    for group in (None, [im.name for im in proj.image_list[1:5]]):
        fast = ba_setup.setup_from_matches(proj, matches, group_images=group,
                                           min_chain_len=3)
        slow = ba_setup.setup_from_matches(proj, m_slow, group_images=group,
                                           min_chain_len=3)
        _assert_setup_equal(fast, slow)


def test_ba_setup_flat_detects_stale_arrays():
    from imageanalysis_tpu.ba import setup as ba_setup

    proj = _make_proj(np.random.default_rng(5))
    for im in proj.image_list:
        im.has_opt_pose = lambda: False
    matches = cleanup.link_matches(proj)
    cleanup.triangulate_ground(proj, matches)
    del matches[0][2]                               # cull-style mutation
    oracle = pickle.loads(pickle.dumps(matches))
    fast = ba_setup.setup_from_matches(proj, matches, min_chain_len=3)
    slow = ba_setup.setup_from_matches(proj, oracle, min_chain_len=3)
    _assert_setup_equal(fast, slow)
