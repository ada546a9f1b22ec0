"""Head-to-head gate vs the ACTUAL reference pipeline (BASELINE.md).

Runs /root/reference/scripts/process.py through the parity shims and our
pipeline on the same tiny synthetic strip, then asserts the fidelity gate:
pair graph equivalent, geometry GT-consistent, RMSE ours <= reference's.

This is minutes of CPU (the reference detects/matches with cv2 + scipy BA),
so it only runs when IMGTPU_PARITY_TEST=1 — the committed PARITY_r4.json
from parity/run_parity.py is the standing evidence; this test keeps the
harness executable end-to-end.
"""

import json
import os
import sys

import pytest

RUN = os.environ.get("IMGTPU_PARITY_TEST") == "1"
HAVE_REF = os.path.isdir("/root/reference/scripts")


@pytest.mark.skipif(not (RUN and HAVE_REF),
                    reason="set IMGTPU_PARITY_TEST=1 (slow; needs the "
                           "reference checkout)")
def test_reference_head_to_head(tmp_path):
    repo = os.path.abspath(os.path.join(os.path.dirname(__file__),
                                        os.pardir))
    sys.path.insert(0, os.path.join(repo, "parity"))
    import run_parity

    out = tmp_path / "parity.json"
    rc = run_parity.main(["--n-images", "8", "--width", "800",
                          "--height", "600", "--work",
                          str(tmp_path / "work"), "--out", str(out),
                          "--detector", "TPU", "--ours-platform", "cpu"])
    assert rc == 0
    r = json.loads(out.read_text())
    assert r["gate_pair_graph"], r
    assert r["gate_geometry"], r
    assert r["gate_rmse_ours_le_ref"], r
