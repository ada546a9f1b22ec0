"""Hard-regime BA convergence: the 4a -> 4b cull -> 4a refine cadence on a
badly-initialized, outlier-contaminated problem (reference
optimizer.py:249-252 mre trajectory; 4b-mre-by-image.py:52-198 cull).

A small instance of benchmarks/ba_hard_bench.py's regime — systematic yaw
bias, altitude bias, position noise, ground-plane point init, and gross
uv outliers — asserted in CI so the regime stays covered between the full
bench runs (VERDICT r4 next #3)."""

import numpy as np
import pytest

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "benchmarks"))

from ba_hard_bench import make_hard_problem  # noqa: E402


@pytest.fixture(scope="module")
def hard_problem():
    rng = np.random.default_rng(3)
    return make_hard_problem(rng, n_cam=12, n_pt=900, obs_per_pt=4,
                             outlier_frac=0.15, yaw_bias_deg=3.0,
                             alt_bias_m=6.0, pos_noise_m=2.0)


def test_hard_regime_converges_and_culls(hard_problem):
    import jax.numpy as jnp
    from imageanalysis_tpu.ba import bundle

    (cams_true, pts_true, cams0, pts0, obs, is_out, K,
     DIST) = hard_problem
    Kj, Dj = jnp.asarray(K), jnp.asarray(DIST)
    cfg = bundle.BAConfig(max_iters=20, bound_vert=9.0)

    # the unattended 4a -> 4b -> 4a cadence: graduated-IRLS solve, then
    # iterated robust cull + refine, GPS bounds anchored at the initial
    # positions throughout — must hit the planted outliers at high recall
    r2, active = bundle.solve_culled(cams0, pts0, obs, Kj, Dj, cfg,
                                     huber_px=4.0, verbose=False)
    assert r2.iters >= 3, "hard regime should need several LM iterations"
    drop = ~active
    tp = int((drop & is_out).sum())
    fn = int((~drop & is_out).sum())
    recall = tp / max(tp + fn, 1)
    assert recall > 0.9, f"cull recall {recall:.3f} (fn={fn})"
    # false positives must be dominated by observations of poisoned
    # points (majority-garbage chains are unrecoverable by design)
    n_per = np.bincount(np.asarray(obs.pt_idx))
    n_out = np.bincount(np.asarray(obs.pt_idx), weights=is_out)
    poisoned = (n_out * 2 >= n_per)[np.asarray(obs.pt_idx)]
    fp_clean = int((drop & ~is_out & ~poisoned).sum())
    precision_excl = tp / max(tp + fp_clean, 1)
    # over-culling clean observations costs coverage, not correctness —
    # the tight MAD threshold also sweeps up clean obs of minority-
    # contaminated chains whose geometry the outlier dragged; the
    # correctness gates are recall + final mre + camera error below
    assert precision_excl > 0.6, \
        f"cull precision excl poisoned {precision_excl:.3f}"

    # clean AND surviving: clean obs of culled (abandoned) points keep
    # stale point parameters, so they don't measure solver quality
    ca = ~is_out & np.asarray(active)
    clean = bundle.BAObservations(cam_idx=obs.cam_idx[ca],
                                  pt_idx=obs.pt_idx[ca],
                                  uv=obs.uv[ca],
                                  weight=obs.weight[ca])
    _, mre_clean, _ = bundle.ba_cost(jnp.asarray(r2.cams),
                                     jnp.asarray(r2.pts), clean, Kj, Dj)
    assert float(mre_clean) < 1.0, \
        f"clean-obs mre {float(mre_clean):.3f} px after refine"

    cams_fit, _, _ = bundle.refit(r2.cams, r2.pts, cams_true[:, :3])
    err = np.linalg.norm(np.asarray(cams_fit)[:, :3] - cams_true[:, :3],
                         axis=1)
    # initialization carries 2 m/axis position noise + 6 m altitude
    # bias, and the GPS bounds anchor at those degraded positions (the
    # reference's trust model, optimizer.py:434-442) — recovery below
    # the noise level is success; drifting past it is the failure mode
    # the anchor exists to stop
    assert float(err.mean()) < 1.2, f"cam err {err.mean():.3f} m"
    assert float(err.max()) < 2.5, f"cam err max {err.max():.3f} m"
