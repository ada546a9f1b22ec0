#!/usr/bin/env python
"""Measured multi-process scaling (VERDICT r2 next #2): the SAME N-image
mission through the full pipeline as 1 process and as R processes
(jax.distributed + Gloo on a virtual CPU mesh), per-rank per-stage wall
clock, and a measured orchestration-overhead factor.

Interpretation on this 1-core host: the physical core is the fixed
resource, so perfect parallelism with zero orchestration cost gives
t_R ≈ t_1; the measured ratio t_R/t_1 IS the multi-process overhead
(barriers, shard merges, duplicated host stages, contention). The honest
R-chip wall estimate for the real mission is then
    (parallel stages measured on chip)/R × (t_R/t_1) + serial host stages
which mission_bench.py applies when BENCH_scaling.json exists.

Usage:
    python benchmarks/scaling_bench.py --n-images 300 --ranks 8 \
        --out BENCH_scaling.json
"""

from __future__ import annotations

import argparse
import json
import os
import re
import shutil
import socket
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CHILD = os.path.join(REPO, "benchmarks", "scaling_child.py")


def _free_port():
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _clear_state(proj_dir):
    shutil.rmtree(os.path.join(proj_dir, "ImageAnalysis"),
                  ignore_errors=True)


def _parse(out):
    m = re.search(r"SCALING_JSON: (\{.*\})", out)
    return json.loads(m.group(1)) if m else None


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-images", type=int, default=300)
    ap.add_argument("--width", type=int, default=1088)
    ap.add_argument("--height", type=int, default=720)
    ap.add_argument("--ranks", type=int, default=8)
    ap.add_argument("--out", default="BENCH_scaling.json")
    ap.add_argument("--project-dir", default=None)
    args = ap.parse_args(argv)

    os.environ.setdefault("JAX_PLATFORM_NAME", "cpu")
    import jax

    jax.config.update("jax_platforms", "cpu")

    from imageanalysis_tpu.io import camera_db
    from imageanalysis_tpu.testing.synthetic import SyntheticMission

    tmp = None
    if args.project_dir:
        proj_dir = args.project_dir
    else:
        tmp = tempfile.mkdtemp(prefix="scaling_bench_")
        proj_dir = os.path.join(tmp, "mission")

    rows = max(args.n_images // 25, 1)
    fx = 1400.0 * args.width / 2176.0
    spacing = 0.25 * (args.width / fx * 100.0)
    t0 = time.perf_counter()
    m = SyntheticMission(proj_dir, n_images=args.n_images,
                         img_size=(args.width, args.height), altitude=100.0,
                         spacing=spacing, fx=fx, rows=rows, seed=42,
                         texture_res=max(2.0 * 100.0 / fx, 0.05),
                         texture_px=8000, world_tiles=True)
    m.generate(skip_existing=bool(args.project_dir))
    gen_s = time.perf_counter() - t0
    db_dir = os.path.join(proj_dir, os.pardir, "cameras")
    camera_db.save("Synthetic_TestCam_none", m.camera_config(), db_dir)

    base_env = dict(os.environ)
    base_env["JAX_PLATFORMS"] = "cpu"
    base_env["JAX_PLATFORM_NAME"] = "cpu"
    base_env["PYTHONPATH"] = REPO + os.pathsep + base_env.get("PYTHONPATH", "")

    # --- single-process reference run ------------------------------------
    _clear_state(proj_dir)
    env1 = dict(base_env)
    env1["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
    print(f"generate done ({gen_s:.1f}s); starting 1-process run", flush=True)
    t0 = time.perf_counter()
    p = subprocess.run([sys.executable, CHILD, proj_dir, db_dir], env=env1,
                       cwd=REPO, capture_output=True, text=True)
    t1_wall = time.perf_counter() - t0
    assert p.returncode == 0, p.stdout[-3000:] + p.stderr[-3000:]
    r1 = _parse(p.stdout)
    print(f"1-process run done ({t1_wall:.1f}s); starting "
          f"{args.ranks}-process run", flush=True)

    # --- R-process run ----------------------------------------------------
    _clear_state(proj_dir)
    port = _free_port()
    procs = []
    t0 = time.perf_counter()
    for i in range(args.ranks):
        env = dict(base_env)
        env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
        env["JAX_COORDINATOR"] = f"localhost:{port}"
        env["JAX_NUM_PROCESSES"] = str(args.ranks)
        env["JAX_PROCESS_ID"] = str(i)
        procs.append(subprocess.Popen(
            [sys.executable, CHILD, proj_dir, db_dir], env=env, cwd=REPO,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True))
    ranks = []
    for i, p in enumerate(procs):
        out, _ = p.communicate(timeout=3600 * 3)
        assert p.returncode == 0, f"rank {i}:\n{out[-3000:]}"
        ranks.append(_parse(out))
    tR_wall = time.perf_counter() - t0

    stages_R = {}
    for k in set().union(*(r["stages"].keys() for r in ranks)):
        stages_R[k] = round(max(r["stages"].get(k, 0.0) for r in ranks), 1)
    overhead = tR_wall / t1_wall
    # per-stage overhead factors (tR/t1): the blended factor hides
    # per-stage anti-scaling (VERDICT r3 weak #2 — BA measured 13.6× at 8
    # ranks while the blend said 1.32); mission_bench extrapolates each
    # stage with its own factor when these exist
    per_stage = {}
    for k, t1k in r1["stages"].items():
        tRk = stages_R.get(k, 0.0)
        if t1k and t1k > 0.05:
            per_stage[k] = round(tRk / t1k, 3)

    result = {
        "n_images": args.n_images,
        "image_size": [args.width, args.height],
        "ranks": args.ranks,
        "host_cores": os.cpu_count(),
        "generate_s": round(gen_s, 1),
        "t1_wall_s": round(t1_wall, 1),
        "t1_stages": r1["stages"],
        "tR_wall_s": round(tR_wall, 1),
        "tR_stages_max_over_ranks": stages_R,
        "tR_per_rank_total_s": [r["total_s"] for r in ranks],
        "measured_overhead_factor": round(overhead, 3),
        "per_stage_overhead_factors": per_stage,
        "note": "1 physical core: perfect parallelism + zero orchestration "
                "cost would give tR == t1; tR/t1 is the measured "
                "multi-process overhead (barriers, shard merges, rank-0 "
                "serial stages, contention). mission_bench.py multiplies "
                "its /R extrapolation by this factor.",
    }
    with open(args.out, "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result))
    if tmp and not args.project_dir:
        shutil.rmtree(tmp, ignore_errors=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
