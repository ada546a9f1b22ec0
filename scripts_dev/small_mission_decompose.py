#!/usr/bin/env python
"""Decompose small-mission latency (VERDICT r4 next #7).

The 20-image parity strip took ours 563.4 s vs the reference's 33.4 s
(PARITY_r4.json) — 17x slower at the scale a user first tries. This
script attributes those seconds: it generates the same strip, runs our
pipeline twice in fresh processes (run 1 = whatever the persistent
compile cache already holds; run 2 = guaranteed warm cache + warm OS
page cache), parses the process CLI's per-stage "stage wall:" log lines
and JAX's compile log, and writes a before/after table.

Usage: python scripts_dev/small_mission_decompose.py
           [--n-images 20] [--width 1280] [--height 960]
           [--out SMALL_MISSION_r5.json] [--cold]

--cold additionally runs once with the persistent compile cache disabled
(IMAGEANALYSIS_TPU_COMPILE_CACHE=0) to measure the true first-user
experience.
"""

from __future__ import annotations

import argparse
import json
import os
import re
import shutil
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "parity"))


def run_ours(ours_dir, db_dir, log_path, args, extra_env=None):
    env = dict(os.environ)
    env["PYTHONPATH"] = f"{REPO}:/root/.axon_site"
    env["JAX_LOG_COMPILES"] = "1"
    if extra_env:
        env.update(extra_env)
    cmd = [sys.executable, "-m", "imageanalysis_tpu.apps.process",
           ours_dir, "--camera", "Synthetic_TestCam_none",
           "--camera-db", db_dir, "--scale", "1.0",
           "--match-strategy", "traditional", "--filter", "homography",
           "--min-chain-len", "3", "--detector", args.detector]
    t0 = time.time()
    with open(log_path, "w") as logf:
        p = subprocess.run(cmd, env=env, stdout=logf,
                           stderr=subprocess.STDOUT)
    return p.returncode, time.time() - t0


def parse_log(log_path):
    """Stage walls + compile events from one run's merged log."""
    walls = {}
    compiles = []          # (name, seconds) from 'Finished XLA compilation'
    n_compile_starts = 0
    for line in open(log_path, errors="replace"):
        m = re.search(r"stage wall: (\S+) ([\d.]+)s", line)
        if m:
            walls[m.group(1)] = float(m.group(2))
        if "Compiling " in line and "with global shapes" in line:
            n_compile_starts += 1
        m = re.search(r"Finished XLA compilation of (\S+) in ([\d.]+) sec",
                      line)
        if m:
            compiles.append((m.group(1), float(m.group(2))))
    total_compile_s = sum(s for _, s in compiles)
    top = sorted(compiles, key=lambda x: -x[1])[:12]
    return {
        "stage_walls_s": walls,
        "n_compile_starts": n_compile_starts,
        "n_compiles_finished": len(compiles),
        "total_compile_s": round(total_compile_s, 1),
        "top_compiles": [[n, round(s, 1)] for n, s in top],
    }


def reset_project(ours_dir):
    ia = os.path.join(ours_dir, "ImageAnalysis")
    if os.path.isdir(ia):
        shutil.rmtree(ia)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-images", type=int, default=20)
    ap.add_argument("--width", type=int, default=1280)
    ap.add_argument("--height", type=int, default=960)
    ap.add_argument("--detector", default="TPU")
    ap.add_argument("--work", default="/tmp/small_decomp")
    ap.add_argument("--out", default=os.path.join(REPO,
                                                  "SMALL_MISSION_r5.json"))
    ap.add_argument("--cold", action="store_true",
                    help="also measure with the compile cache disabled")
    args = ap.parse_args(argv)

    import run_parity  # parity harness: reuse its mission builder

    os.makedirs(args.work, exist_ok=True)
    m, ref_dir, ours_dir, db_dir = run_parity.make_mission(
        args.work, args.n_images, args.width, args.height, rows=1)
    from imageanalysis_tpu.testing.synthetic import REF_LLA
    run_parity.write_flat_srtm_tiles(REF_LLA[0], REF_LLA[1])

    result = {"n_images": args.n_images,
              "image_size": [args.width, args.height],
              "detector": args.detector,
              "reference_wall_s_r4": 33.4,
              "ours_wall_s_r4": 563.4,
              "runs": {}}

    def one(tag, extra_env=None):
        reset_project(ours_dir)
        lp = os.path.join(args.work, f"ours_{tag}.log")
        rc, wall = run_ours(ours_dir, db_dir, lp, args, extra_env)
        r = {"rc": rc, "wall_s": round(wall, 1)}
        r.update(parse_log(lp))
        result["runs"][tag] = r
        print(f"{tag}: wall {wall:.1f}s rc={rc} "
              f"compile {r['total_compile_s']}s "
              f"({r['n_compiles_finished']} compiles)", flush=True)
        return r

    if args.cold:
        one("cold_nocache", {"IMAGEANALYSIS_TPU_COMPILE_CACHE": "0"})
    one("run1_existing_cache")
    one("run2_warm")

    with open(args.out, "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
