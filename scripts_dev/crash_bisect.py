"""Bisect the TPU-worker crash boundary for batched detect (VERDICT r3 #4).

Known from r2/r3 probes: 0.78 MP frames wedge the worker at B=2 while
0.5 MP x 8 is stable; full-res B=1 (3.13 MP, upsampled first octave
4352x2880) is stable. This driver names the real constraint by running one
configuration per subprocess, treating a child timeout as a worker wedge,
and health-checking (trivial matmul in a fresh client) until the worker
self-recovers (~6 min, memory: axon-tpu-runtime-quirks) before the next
probe.

Usage: python scripts_dev/crash_bisect.py [plan.json]
Results appended to /tmp/crash_bisect_results.jsonl as they land.
"""

import json
import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
ENV = dict(os.environ, PYTHONPATH=f"{REPO}:/root/.axon_site")
RESULTS = "/tmp/crash_bisect_results.jsonl"


def run_child(cfg, timeout):
    cmd = [sys.executable, os.path.join(HERE, "crash_probe_child.py"),
           json.dumps(cfg)]
    t0 = time.time()
    try:
        p = subprocess.run(cmd, env=ENV, timeout=timeout,
                           capture_output=True, text=True)
        ok = p.returncode == 0 and "CHILD_OK" in p.stdout
        return ("ok" if ok else "error", time.time() - t0,
                (p.stdout + p.stderr)[-500:])
    except subprocess.TimeoutExpired:
        return "wedge", time.time() - t0, ""


def health_check():
    code = ("import jax, jax.numpy as jnp; "
            "a = jnp.ones((256, 256)); "
            "print(float((a @ a).sum()))")
    try:
        p = subprocess.run([sys.executable, "-c", code], env=ENV,
                           timeout=90, capture_output=True, text=True)
        return p.returncode == 0
    except subprocess.TimeoutExpired:
        return False


def wait_recovery(max_tries=15):
    for i in range(max_tries):
        if health_check():
            print(f"  worker healthy (try {i + 1})", flush=True)
            return True
        print(f"  worker still wedged, waiting 60s (try {i + 1})",
              flush=True)
        time.sleep(60)
    return False


def main():
    if len(sys.argv) > 1:
        plan = json.load(open(sys.argv[1]))
    else:
        plan = [
            # 1. reconfirm the r3 crash with the production path
            {"H": 720, "W": 1088, "B": 2, "stage": "full"},
            # 2. pyramid alone (pallas blur)
            {"H": 720, "W": 1088, "B": 2, "stage": "pyramid"},
            # 3. pyramid with the jnp blur
            {"H": 720, "W": 1088, "B": 2, "stage": "pyramid",
             "blur": "jnp"},
            # 4. no upsample at the equivalent post-upsample size
            {"H": 1440, "W": 2176, "B": 2, "stage": "pyramid",
             "upsample": False},
            # 5. single octave
            {"H": 720, "W": 1088, "B": 2, "stage": "pyramid",
             "n_octaves": 1},
        ]
    timeout = 360
    for cfg in plan:
        print("probe:", json.dumps(cfg), flush=True)
        verdict, dt, tail = run_child(cfg, timeout)
        print(f"  -> {verdict} ({dt:.0f}s) {tail.strip()[:200]}",
              flush=True)
        with open(RESULTS, "a") as f:
            f.write(json.dumps({"cfg": cfg, "verdict": verdict,
                                "wall_s": round(dt, 1)}) + "\n")
        if verdict == "wedge":
            if not wait_recovery():
                print("worker did not recover; stopping", flush=True)
                return 1
    print("BISECT DONE", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
