"""Run the on-TPU kernel test suite and write TESTS_TPU_r{N}.json.

Usage: python scripts_dev/run_tpu_tests.py [round]
Writes the pass/fail artifact at the repo root (VERDICT r3 item 7)."""
import json
import os
import re
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    rnd = sys.argv[1] if len(sys.argv) > 1 else "4"
    t0 = time.time()
    proc = subprocess.run(
        [sys.executable, "-m", "pytest", "tests_tpu", "-q", "--tb=line",
         "-rf", "-p", "no:cacheprovider"],
        cwd=ROOT, capture_output=True, text=True)
    wall = time.time() - t0
    out = proc.stdout + proc.stderr
    tail = "\n".join(out.strip().splitlines()[-25:])
    counts = {k: 0 for k in ("passed", "failed", "skipped", "error")}
    for num, kind in re.findall(r"(\d+) (passed|failed|skipped|error)", out):
        counts[kind] = int(num)
    head = subprocess.run(["git", "rev-parse", "--short", "HEAD"], cwd=ROOT,
                          capture_output=True, text=True).stdout.strip()
    artifact = {
        "suite": "tests_tpu (Mosaic-compiled kernel tests on the real chip)",
        "git_head": head,
        "rc": proc.returncode,
        "wall_s": round(wall, 1),
        **counts,
        "ok": proc.returncode == 0 and counts["passed"] > 0,
        "tail": tail,
    }
    path = os.path.join(ROOT, f"TESTS_TPU_r{rnd}.json")
    with open(path, "w") as f:
        json.dump(artifact, f, indent=1)
    print(json.dumps({k: artifact[k] for k in
                      ("rc", "wall_s", "passed", "failed", "ok")}))
    print("wrote", path)
    return proc.returncode


if __name__ == "__main__":
    sys.exit(main())
