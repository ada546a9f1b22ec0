"""apps/video CLI smoke tests: each subcommand produces its artifact
(reference video/1a-est-gyro-rates.py, 1c-smooth-video.py,
2-gen-hud-overlay.py, 3-extract-and-geotag-frames.py driver flows)."""

import csv
import os

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from imageanalysis_tpu.apps import video as video_cli


@pytest.fixture(scope="module")
def flight_video(tmp_path_factory):
    """Short clip of a textured plane rotating at a known rate + a matching
    flight log CSV."""
    rng = np.random.default_rng(5)
    d = tmp_path_factory.mktemp("vcli")
    path = str(d / "flight.mp4")
    base = cv2.GaussianBlur(rng.uniform(0, 255, (720, 720)).astype(np.float32),
                            (0, 0), 2)
    base = cv2.normalize(base, None, 0, 255, cv2.NORM_MINMAX).astype(np.uint8)
    fps, n_frames = 30.0, 45
    w = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), fps, (480, 480))
    for i in range(n_frames):
        M = cv2.getRotationMatrix2D((360, 360), 10.0 * i / fps, 1.0)
        fr = cv2.warpAffine(base, M, (720, 720))[120:600, 120:600]
        w.write(cv2.cvtColor(fr, cv2.COLOR_GRAY2BGR))
    w.release()

    logf = str(d / "flight.csv")
    with open(logf, "w", newline="") as f:
        wcsv = csv.writer(f)
        wcsv.writerow(["time", "lat", "lon", "alt", "roll", "pitch", "yaw",
                       "vn", "ve", "vd", "airspeed"])
        for i in range(30):
            wcsv.writerow([i * 0.5, 44.97 + i * 1e-5, -93.26, 120.0,
                           2.0, 1.0, (i * 3.0) % 360, 20.0, 0.0, 0.0, 21.0])
    return path, logf, fps


def test_cli_est_gyro_rates(flight_video, tmp_path):
    video_path, _, _ = flight_video
    out = str(tmp_path / "motion.csv")
    rc = video_cli.main(["est-gyro-rates", video_path, "--out", out,
                         "--max-frames", "20"])
    assert rc == 0
    with open(out) as f:
        rows = list(csv.DictReader(f))
    assert len(rows) >= 10
    assert "rotation (deg)" in rows[0]


def test_cli_stabilize(flight_video, tmp_path):
    video_path, _, _ = flight_video
    out = str(tmp_path / "stab.mp4")
    rc = video_cli.main(["stabilize", video_path, "--out", out,
                         "--max-frames", "15"])
    assert rc == 0
    cap = cv2.VideoCapture(out)
    ret, frame = cap.read()
    assert ret and frame.shape[1] == 480


def test_cli_hud_overlay_with_autosync(flight_video, tmp_path):
    video_path, logf, _ = flight_video
    motion = str(tmp_path / "motion.csv")
    assert video_cli.main(["est-gyro-rates", video_path, "--out", motion,
                           "--max-frames", "20"]) == 0
    out = str(tmp_path / "hud.mp4")
    rc = video_cli.main(["hud-overlay", video_path, "--flight", logf,
                         "--movie-csv", motion, "--style", "glass",
                         "--max-frames", "8", "--out", out])
    assert rc == 0
    cap = cv2.VideoCapture(out)
    ret, frame = cap.read()
    assert ret and frame.std() > 10


def test_cli_extract_geotag(flight_video, tmp_path):
    video_path, _, _ = flight_video
    logf = str(tmp_path / "DJIFlightRecord_2023-06-01_[10-00-00].csv")
    lines = ["CUSTOM.updateTime [local], OSD.latitude, OSD.longitude,"
             " OSD.altitude [ft], GIMBAL.pitch, GIMBAL.roll, GIMBAL.yaw"]
    for i in range(40):
        lines.append(f"10:00:{i:02d} AM,44.97{i:02d},-93.26{i:02d},"
                     f"{300 + i},-90.0,0.0,{i * 2}")
    with open(logf, "w") as f:
        f.write("\n".join(lines) + "\n")
    out_dir = str(tmp_path / "frames")
    rc = video_cli.main(["extract-geotag", video_path, "--log", logf,
                         "--out-dir", out_dir, "--interval", "0.5"])
    assert rc == 0
    assert os.path.isfile(os.path.join(out_dir, "pix4d.csv"))
    jpgs = [f for f in os.listdir(out_dir) if f.endswith(".jpg")]
    assert len(jpgs) >= 2
