"""Video subsystem tests on synthetic footage and logs."""

import os

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from imageanalysis_tpu.video import camera as vcam
from imageanalysis_tpu.video import correlate, djilog, frame_motion, horizon, hud
from imageanalysis_tpu.core import rotations as rot


@pytest.fixture(scope="module")
def rotating_video(tmp_path_factory):
    """Video of a textured plane rotating at a known rate."""
    rng = np.random.default_rng(4)
    d = tmp_path_factory.mktemp("video")
    path = str(d / "rot.mp4")
    base = cv2.GaussianBlur(rng.uniform(0, 255, (720, 720)).astype(np.float32),
                            (0, 0), 2)
    base = cv2.normalize(base, None, 0, 255, cv2.NORM_MINMAX).astype(np.uint8)
    fps, n_frames = 30.0, 60
    rate_deg_s = 12.0
    w = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), fps, (480, 480))
    for i in range(n_frames):
        ang = rate_deg_s * i / fps
        M = cv2.getRotationMatrix2D((360, 360), ang, 1.0)
        fr = cv2.warpAffine(base, M, (720, 720))[120:600, 120:600]
        w.write(cv2.cvtColor(fr, cv2.COLOR_GRAY2BGR))
    w.release()
    return path, fps, rate_deg_s


def test_frame_motion_recovers_rotation(rotating_video):
    path, fps, rate = rotating_video
    recs = frame_motion.estimate_motion(path)
    assert len(recs) > 40
    rots = np.array([r[2] for r in recs])  # deg/frame
    est_rate = np.median(rots) * fps
    assert abs(abs(est_rate) - rate) < 1.5, est_rate


def test_motion_csv_contract(rotating_video, tmp_path):
    path, _, _ = rotating_video
    recs = frame_motion.estimate_motion(path, max_frames=15)
    out = str(tmp_path / "rot.csv")
    frame_motion.write_motion_csv(recs, out)
    import csv as csvmod
    with open(out) as f:
        rows = list(csvmod.DictReader(f))
    assert set(rows[0]) == {"frame", "time", "rotation (deg)",
                            "translation x (px)", "translation y (px)"}


def test_sync_clocks_recovers_shift(rng):
    """Plant a known time shift between 'flight' and 'movie' signals."""
    t_flight = np.arange(0, 120, 1 / 100)
    # zero-mean band-limited signal, like real gyro rates
    sig = np.convolve(rng.normal(0, 1, len(t_flight)), np.ones(30) / 30,
                      mode="same")
    true_shift = 17.3
    t_movie = np.arange(0, 60, 1 / 30)
    movie_sig = np.interp(t_movie + true_shift, t_flight, sig)
    shift, ycorr = correlate.sync_clocks(t_flight, sig, t_movie, movie_sig)
    assert abs(shift - true_shift) < 0.1, shift


def test_virtual_camera_projection():
    cam = vcam.VirtualCamera({
        "K": [800.0, 0, 320, 0, 800.0, 240, 0, 0, 1],
        "dist_coeffs": [0] * 5, "width_px": 640, "height_px": 480,
        "mount": {"yaw_deg": 0.0, "pitch_deg": 0.0, "roll_deg": 0.0}})
    # level flight north: point dead ahead at same height → image center
    ned = [0.0, 0.0, -100.0]
    q = np.asarray(rot.quat_from_ypr(0.0, 0.0, 0.0))
    uv = cam.project_ned([[500.0, 0.0, -100.0]], ned, q)
    np.testing.assert_allclose(uv[0], [320, 240], atol=1e-3)
    # point to the right → +u
    uv = cam.project_ned([[500.0, 50.0, -100.0]], ned, q)
    assert uv[0][0] > 320
    # behind → nan
    uv = cam.project_ned([[-500.0, 0.0, -100.0]], ned, q)
    assert np.isnan(uv[0]).all()


def test_dji_csv_and_extract(tmp_path, rotating_video):
    video_path, fps, _ = rotating_video
    logf = tmp_path / "DJIFlightRecord_2023-06-01_[10-00-00].csv"
    lines = ["CUSTOM.updateTime [local], OSD.latitude, OSD.longitude,"
             " OSD.altitude [ft], GIMBAL.pitch, GIMBAL.roll, GIMBAL.yaw"]
    for i in range(40):
        t = f"10:00:{i:02d}"
        lines.append(f"{t} AM,44.97{i:02d},-93.26{i:02d},{300+i},-90.0,0.0,{i*2}")
    logf.write_text("\n".join(lines) + "\n")
    log = djilog.DjiCsv().load(str(logf))
    assert len(log.records) == 40
    q = log.query(log.records[0]["unix_sec"] + 1.5)
    assert 44.9700 < q["lat"] < 44.9704
    assert abs(q["baro_alt"] - (300 + 1.5) * 0.3048) < 0.1

    out_dir = str(tmp_path / "frames")
    names = djilog.extract_frames(video_path, log, out_dir, interval=0.5)
    assert len(names) >= 3
    assert os.path.isfile(os.path.join(out_dir, "pix4d.csv"))
    assert os.path.isfile(os.path.join(out_dir, names[0]))
    # EXIF geotag write-back (reference 3-extract-and-geotag-frames.py):
    # the extracted frame's GPS tags round-trip through our parser
    from imageanalysis_tpu.io import exif as exif_mod
    lon, lat, alt, unixtime, *_ = exif_mod.get_pose(
        os.path.join(out_dir, names[0]))
    assert lat is not None and 44.96 < lat < 44.98
    assert lon is not None and -93.27 < lon < -93.25
    assert alt is not None and 80 < alt < 120
    assert unixtime is not None


def test_horizon_detection():
    """Sky/ground split at a known roll angle."""
    K = np.array([[700.0, 0, 320], [0, 700.0, 240], [0, 0, 1]])
    for roll_deg in (0.0, 10.0, -15.0):
        img = np.zeros((480, 640, 3), np.uint8)
        yy, xx = np.mgrid[0:480, 0:640]
        # line through center with slope tan(roll): sky above
        sky = (yy - 240) < -np.tan(np.radians(roll_deg)) * (xx - 320)
        img[sky] = (230, 160, 120)       # blue-ish sky
        img[~sky] = (40, 90, 60)         # ground
        res = horizon.detect_horizon(img, K)
        assert res is not None
        r, p, line = res
        assert abs(np.degrees(r) - roll_deg) < 2.0
        assert abs(np.degrees(p)) < 2.0


def test_hud_overlay(rotating_video, tmp_path):
    video_path, fps, _ = rotating_video
    cam = vcam.VirtualCamera({
        "K": [500.0, 0, 240, 0, 500.0, 240, 0, 0, 1],
        "dist_coeffs": [0] * 5, "width_px": 480, "height_px": 480})

    def state_fn(t):
        q = np.asarray(rot.quat_from_ypr(np.radians(5 * t), 0.05, 0.02))
        return dict(ned=[t * 20.0, 0, -120.0], quat=q,
                    ypr_deg=(5 * t, np.degrees(0.05), np.degrees(0.02)),
                    vel_ned=[20.0, 0, 0])

    out = str(tmp_path / "hud.mp4")
    n = hud.overlay_video(video_path, out, cam, state_fn, max_frames=10)
    assert n == 10
    cap = cv2.VideoCapture(out)
    ret, frame = cap.read()
    assert ret
    # HUD drew something green-ish
    greens = (frame[..., 1].astype(int) - frame[..., 0]) > 60
    assert greens.sum() > 200


def test_hud_glass_style(rotating_video, tmp_path):
    from imageanalysis_tpu.video import camera as vc, hud as hud_mod

    video_path, fps, _ = rotating_video
    cam = vc.VirtualCamera({
        "K": [500.0, 0, 240, 0, 500.0, 240, 0, 0, 1],
        "dist_coeffs": [0] * 5, "width_px": 480, "height_px": 480})

    def state_fn(t):
        import numpy as np
        from imageanalysis_tpu.core import rotations as rot
        q = np.asarray(rot.quat_from_ypr(0.1, 0.05, np.radians(12.0)))
        return dict(ned=[t * 20.0, 0, -120.0], quat=q,
                    ypr_deg=(np.degrees(0.1), np.degrees(0.05), 12.0),
                    vel_ned=[20.0, 0, 0])

    out = str(tmp_path / "glass.mp4")
    n = hud_mod.overlay_video(video_path, out, cam, state_fn, max_frames=5,
                              style="glass")
    assert n == 5
    cap = cv2.VideoCapture(out)
    ret, frame = cap.read()
    assert ret and frame.std() > 10
