#!/usr/bin/env python
"""Small-mission latency decomposition (VERDICT r4 missing #5).

The 20-image head-to-head strip took ours 563 s vs the reference's 33 s
(PARITY_r4.json) — at the scale a user first tries, compile latency, not
compute, dominates. This bench runs the SAME 20-image pipeline twice in
fresh processes:

  cold: empty jit cache directory (worst case, first-ever run)
  warm: persistent compilation cache populated by the cold run (every
        later run on any same-shaped mission — the steady state)

and decomposes each wall into stage walls + XLA compile time + device
execute + host, from the pipeline's stage markers and JAX_LOG_COMPILES
events. Writes LATENCY_20IMG.json.

Usage: python benchmarks/small_mission_latency.py [--n-images 20]
"""

from __future__ import annotations

import argparse
import json
import os
import re
import shutil
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def parse_log(path):
    txt = open(path).read()
    comp = re.findall(
        r"Finished XLA compilation of jit\(([^)]*)\) in ([0-9.]+) sec", txt)
    stages = dict(re.findall(r"stage wall: (\S+) ([0-9.]+)s", txt))
    tracing = re.findall(
        r"Finished tracing \+ transforming ([^ ]*) for pjit in ([0-9.]+)", txt)
    cache_hits = len(re.findall(r"Persistent compilation cache hit", txt))
    top = sorted(((float(s), n) for n, s in comp), reverse=True)[:8]
    return {
        "stage_walls_s": {k: float(v) for k, v in stages.items()},
        "n_xla_compiles": len(comp),
        "xla_compile_s": round(sum(float(s) for _, s in comp), 1),
        "trace_s": round(sum(float(s) for _, s in tracing), 1),
        "persistent_cache_hits": cache_hits,
        "top_compiles": [[n, round(s, 1)] for s, n in top],
    }


def run_once(proj_src, cams, cache_dir, log_path, platform=""):
    """Copy the pristine project (images + pix4d only), run the pipeline."""
    work = tempfile.mkdtemp(prefix="latency20_")
    proj = os.path.join(work, "proj")
    os.makedirs(proj)
    for f in os.listdir(proj_src):
        src = os.path.join(proj_src, f)
        if os.path.isfile(src):
            os.link(src, os.path.join(proj, f))
    env = dict(os.environ)
    env["PYTHONPATH"] = f"{REPO}:/root/.axon_site"
    env["JAX_LOG_COMPILES"] = "1"
    env["IMAGEANALYSIS_TPU_COMPILE_CACHE"] = cache_dir
    if platform:
        env["IMGTPU_PLATFORM"] = platform
    cmd = [sys.executable, "-m", "imageanalysis_tpu.apps.process", proj,
           "--camera", "Synthetic_TestCam_none", "--camera-db", cams,
           "--scale", "1.0", "--detector", "TPU",
           "--worklist", "sequential"]
    t0 = time.time()
    with open(log_path, "w") as logf:
        p = subprocess.run(cmd, env=env, stdout=logf,
                           stderr=subprocess.STDOUT)
    wall = time.time() - t0
    shutil.rmtree(work, ignore_errors=True)
    return p.returncode, wall


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-images", type=int, default=20)
    ap.add_argument("--width", type=int, default=1024)
    ap.add_argument("--height", type=int, default=768)
    ap.add_argument("--platform", default="")
    ap.add_argument("--work", default="/tmp/latency20_mission")
    ap.add_argument("--out", default=os.path.join(REPO,
                                                  "LATENCY_20IMG.json"))
    args = ap.parse_args(argv)

    sys.path.insert(0, REPO)
    import jax

    jax.config.update("jax_platforms", "cpu")   # orchestrator stays off-TPU
    from imageanalysis_tpu.io import camera_db
    from imageanalysis_tpu.testing.synthetic import SyntheticMission

    # same mission construction as parity/run_parity.py (rows auto)
    fx = 1400.0 * args.width / 2176.0
    ground_w = args.width / fx * 100.0
    spacing = 0.25 * ground_w
    rows = max(args.n_images // 25, 1)
    src = os.path.join(args.work, "proj")
    m = SyntheticMission(src, n_images=args.n_images,
                         img_size=(args.width, args.height), altitude=100.0,
                         spacing=spacing, fx=fx, rows=rows, seed=42,
                         texture_res=max(2.0 * 100.0 / fx, 0.05),
                         texture_px=4096)
    m.generate(skip_existing=os.path.isfile(os.path.join(src, "pix4d.csv")))
    cams = os.path.join(args.work, "cams")
    camera_db.save("Synthetic_TestCam_none", m.camera_config(), cams)

    cache = os.path.join(args.work, "jaxcache")
    shutil.rmtree(cache, ignore_errors=True)
    os.makedirs(cache, exist_ok=True)

    result = {"n_images": args.n_images,
              "image_size": [args.width, args.height]}
    for phase in ("cold", "warm"):
        log_path = os.path.join(args.work, f"{phase}.log")
        rc, wall = run_once(src, cams, cache, log_path,
                            platform=args.platform)
        d = parse_log(log_path)
        d["rc"] = rc
        d["wall_s"] = round(wall, 1)
        result[phase] = d
        print(f"{phase}: wall {wall:.1f}s rc={rc} "
              f"compiles {d['n_xla_compiles']} ({d['xla_compile_s']}s), "
              f"cache hits {d['persistent_cache_hits']}", flush=True)
    result["reference_wall_s_20img"] = 33.4     # PARITY_r4.json
    with open(args.out, "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
