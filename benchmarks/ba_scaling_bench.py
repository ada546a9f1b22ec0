#!/usr/bin/env python
"""BA-only multi-process scaling benchmark (VERDICT r3 next #3).

Round 3's full-pipeline scaling bench measured 13.6x 8-rank BA overhead
(BENCH_scaling.json r3: 10.9 s -> 148.3 s at 300 images): the
NamedSharding formulation let XLA insert a (n_pt, 3) psum into every CG
matvec. The point-local shard_map solver (parallel/sharded.py
make_pointlocal_ba) keeps point reductions shard-local; this bench
isolates the BA stage and measures the same 1-process-vs-R-process
overhead factor on the virtual CPU mesh (Gloo collectives standing in
for ICI, exactly like the full scaling bench).

Interpretation on the 1-core host: R processes each solve 1/R of the
sharded work, so perfect parallelism + zero collective cost gives
tR == t1; tR/t1 is the measured multi-process overhead. The warm factor
(second solve, jits cached) is the hardware-predictive number — on real
chips compilation is per-process-parallel and once-per-mission, while on
this host 8 processes compile serially.

Usage: python benchmarks/ba_scaling_bench.py [--n-cam 300] [--n-pt 40000]
       [--ranks 8] [--out BENCH_ba_scaling.json]
"""

from __future__ import annotations

import argparse
import json
import os
import re
import socket
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CHILD = os.path.join(REPO, "benchmarks", "ba_scaling_child.py")


def _free_port():
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _parse(out):
    m = re.search(r"BA_SCALING_JSON: (\{.*\})", out)
    return json.loads(m.group(1)) if m else None


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-cam", type=int, default=300)
    ap.add_argument("--n-pt", type=int, default=40000)
    ap.add_argument("--ranks", type=int, default=8)
    ap.add_argument("--out", default=os.path.join(REPO,
                                                  "BENCH_ba_scaling.json"))
    args = ap.parse_args(argv)

    base_env = dict(os.environ)
    base_env["JAX_PLATFORMS"] = "cpu"
    base_env["JAX_PLATFORM_NAME"] = "cpu"
    base_env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
    base_env["PYTHONPATH"] = REPO + os.pathsep + base_env.get("PYTHONPATH",
                                                              "")
    for k in ("JAX_COORDINATOR", "JAX_NUM_PROCESSES", "JAX_PROCESS_ID"):
        base_env.pop(k, None)
    size = [str(args.n_cam), str(args.n_pt)]

    # --- single-process production path ----------------------------------
    t0 = time.perf_counter()
    p = subprocess.run([sys.executable, CHILD, "single"] + size,
                       env=base_env, cwd=REPO, capture_output=True,
                       text=True)
    t1_wall = time.perf_counter() - t0
    assert p.returncode == 0, p.stdout[-3000:] + p.stderr[-3000:]
    r1 = _parse(p.stdout)
    print(f"single: {r1}", flush=True)

    # --- R-process point-local sharded path ------------------------------
    port = _free_port()
    procs = []
    t0 = time.perf_counter()
    for i in range(args.ranks):
        env = dict(base_env)
        env["JAX_COORDINATOR"] = f"localhost:{port}"
        env["JAX_NUM_PROCESSES"] = str(args.ranks)
        env["JAX_PROCESS_ID"] = str(i)
        procs.append(subprocess.Popen(
            [sys.executable, CHILD, "sharded"] + size, env=env, cwd=REPO,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True))
    ranks = []
    for i, p in enumerate(procs):
        out, _ = p.communicate(timeout=3600)
        assert p.returncode == 0, f"rank {i}:\n{out[-3000:]}"
        ranks.append(_parse(out))
    tR_wall = time.perf_counter() - t0
    print(f"sharded ranks: {ranks}", flush=True)

    cold_R = max(r["cold_s"] for r in ranks)
    warm_R = max(r["warm_s"] for r in ranks)
    result = {
        "n_cam": args.n_cam, "n_pt": args.n_pt, "n_obs": r1["n_obs"],
        "ranks": args.ranks, "host_cores": os.cpu_count(),
        "single": {"cold_s": r1["cold_s"], "warm_s": r1["warm_s"],
                   "iters": r1["warm_iters"], "mre_px": r1["mre_px"],
                   "wall_s": round(t1_wall, 1)},
        "sharded": {"cold_s": cold_R, "warm_s": warm_R,
                    "iters": ranks[0]["warm_iters"],
                    "mre_px": ranks[0]["mre_px"],
                    "wall_s": round(tR_wall, 1)},
        "overhead_factor_warm": round(warm_R / r1["warm_s"], 3),
        "overhead_factor_cold": round(cold_R / r1["cold_s"], 3),
        "r3_reference": {"overhead_factor": 13.6,
                         "note": "NamedSharding formulation, full-pipeline "
                                 "scaling bench r3 (10.9 -> 148.3 s)"},
        "note": "1 physical core: perfect parallelism + zero collective "
                "cost gives tR == t1; warm factor excludes the 8x serial "
                "compilation this host pays that real chips do not.",
    }
    with open(args.out, "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
