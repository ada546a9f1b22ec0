"""CI-scale run of the mission benchmark harness (BASELINE rebuild target
is measured at 300 images on the real chip — see BENCH_mission.json; this
keeps the harness itself continuously verified)."""

import json
import os

import pytest

cv2 = pytest.importorskip("cv2")


def test_mission_bench_small(tmp_path):
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir,
                                    "benchmarks"))
    import mission_bench

    out = str(tmp_path / "bench.json")
    rc = mission_bench.main(["--n-images", "6", "--width", "640",
                             "--height", "480", "--out", out])
    assert rc == 0
    r = json.load(open(out))
    assert r["n_images"] == 6
    assert r["pipeline_total_s"] > 0
    assert r["detect_s"] > 0 and r["match_s"] > 0 and r["ba_s"] > 0
    assert r["ba_mre_px"] < 1.0
    # synthetic ground truth recovered to centimeters
    assert r["cam_pos_err_mean_m"] < 0.3
    assert r["extrapolated_2812img_8chip_s"] > 0
