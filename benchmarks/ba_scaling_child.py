"""One rank of the BA-only scaling benchmark (ba_scaling_bench.py).

Builds the SAME deterministic synthetic BA problem on every rank
(ba_hard_bench.make_hard_problem, seed fixed, no planted outliers by
default), then solves it twice — cold (includes compile) and warm — with
either the production single-chip solver (bundle.solve) or the
point-local sharded solver (parallel.sharded.solve_sharded) over the
global multi-process mesh. Prints one parseable JSON line.
"""

import json
import os
import sys
import time

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, HERE)

import ba_hard_bench  # noqa: E402


def main():
    mode = sys.argv[1]                      # "single" | "sharded"
    n_cam = int(sys.argv[2])
    n_pt = int(sys.argv[3])

    import imageanalysis_tpu  # noqa: F401  (matmul precision pin)
    import jax.numpy as jnp
    from imageanalysis_tpu.ba import bundle

    if mode == "sharded":
        from imageanalysis_tpu.parallel import multihost, sharded
        if os.environ.get("JAX_COORDINATOR"):
            if not multihost.maybe_initialize_distributed():
                sys.exit("jax.distributed did not initialize")
        mesh = multihost.global_mesh()

    rng = np.random.default_rng(7)
    (cams_true, pts_true, cams0, pts0, obs, is_out, K,
     DIST) = ba_hard_bench.make_hard_problem(
        rng, n_cam, n_pt, outlier_frac=0.0, yaw_bias_deg=1.0,
        alt_bias_m=2.0, pos_noise_m=1.0)
    cfg = bundle.BAConfig(max_iters=8, ftol=1e-6)
    Kj, Dj = jnp.asarray(K), jnp.asarray(DIST)

    def run():
        t0 = time.perf_counter()
        if mode == "single":
            r = bundle.solve(cams0, pts0, obs, Kj, Dj, cfg, verbose=False)
        else:
            r = sharded.solve_sharded(cams0, pts0, obs, Kj, Dj, mesh, cfg,
                                      verbose=False)
        return time.perf_counter() - t0, r

    cold_s, r_cold = run()
    warm_s, r_warm = run()
    rank = jax.process_index() if jax.process_count() > 1 else 0
    print("BA_SCALING_JSON: " + json.dumps({
        "rank": rank, "mode": mode,
        "n_obs": int(np.asarray(obs.uv).shape[0]),
        "cold_s": round(cold_s, 2), "cold_iters": r_cold.iters,
        "warm_s": round(warm_s, 2), "warm_iters": r_warm.iters,
        "mre_px": round(float(r_warm.mre), 4),
    }), flush=True)
    sys.exit(0)


if __name__ == "__main__":
    main()
