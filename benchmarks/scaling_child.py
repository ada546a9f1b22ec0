"""One rank of the multi-process scaling benchmark: run the full pipeline
on a pre-generated mission with per-stage wall instrumentation, print one
parseable JSON line. Launched by scaling_bench.py with JAX_COORDINATOR /
JAX_NUM_PROCESSES / JAX_PROCESS_ID set (single-process mode when unset)."""

import json
import os
import sys
import time

import jax

jax.config.update("jax_platforms", "cpu")


def main():
    proj_dir, db_dir = sys.argv[1], sys.argv[2]
    times = {}

    def wrap(mod, name, key):
        orig = getattr(mod, name)

        def timed(*a, **kw):
            t = time.perf_counter()
            r = orig(*a, **kw)
            times[key] = times.get(key, 0.0) + (time.perf_counter() - t)
            return r

        setattr(mod, name, timed)

    # NOTE: import order — process.main does the jax.distributed bootstrap,
    # so only pure-python module patching may happen before run
    from imageanalysis_tpu.apps import process
    from imageanalysis_tpu.ba import bundle as bundle_mod
    from imageanalysis_tpu.features import detect as detect_mod
    from imageanalysis_tpu.match import cleanup as cleanup_mod
    from imageanalysis_tpu.match import groups as groups_mod
    from imageanalysis_tpu.match import matcher as matcher_mod
    from imageanalysis_tpu.match import smart as smart_mod
    from imageanalysis_tpu.parallel import sharded as sharded_mod
    from imageanalysis_tpu.render import build_map as build_map_mod

    wrap(detect_mod, "detect_project_features", "detect")
    wrap(matcher_mod, "find_matches", "match")
    wrap(matcher_mod.BatchMatcher, "__init__", "matcher_init")
    wrap(bundle_mod, "solve", "ba")
    wrap(sharded_mod, "solve_sharded", "ba")
    wrap(cleanup_mod, "link_matches", "link")
    wrap(cleanup_mod, "triangulate_ground", "triangulate")
    wrap(groups_mod, "compute", "groups")
    wrap(smart_mod, "requalify_pairs", "requalify")
    wrap(build_map_mod, "build", "render")

    t0 = time.perf_counter()
    rc = process.main([proj_dir, "--camera", "Synthetic_TestCam_none",
                       "--camera-db", db_dir, "--scale", "1.0",
                       "--ground", "0.0", "--batch-size", "16",
                       "--min-chain-len", "2", "--max-features", "2048"])
    total = time.perf_counter() - t0
    rank = jax.process_index() if jax.process_count() > 1 else 0
    print("SCALING_JSON: " + json.dumps({
        "rank": rank, "rc": rc, "total_s": round(total, 1),
        "stages": {k: round(v, 1) for k, v in times.items()},
    }), flush=True)
    sys.exit(rc)


if __name__ == "__main__":
    main()
