import os

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")


def test_mount_estimation(rng):
    """Recover a planted camera-mount rotation from paired gyro rates."""
    from imageanalysis_tpu.core.rotations import quat_from_ypr, quat_to_matrix
    from imageanalysis_tpu.video import mount

    ypr_true = np.radians([5.0, -88.0, 2.0])
    R_true = np.asarray(quat_to_matrix(quat_from_ypr(*ypr_true)))
    # the mount maps body rates into camera rates: ω_cam = R_mountᵀ ω_body
    R_map = R_true.T
    body = rng.normal(0, 0.5, (300, 3))
    cam = body @ R_map.T + rng.normal(0, 0.01, (300, 3))
    ypr_est, R_est, rms = mount.estimate_mount(body, cam)
    np.testing.assert_allclose(R_est, R_map, atol=0.02)
    assert rms < 0.05


def test_mount_from_logs(rng):
    from imageanalysis_tpu.core.rotations import quat_from_ypr, quat_to_matrix
    from imageanalysis_tpu.video import mount

    R_map = np.asarray(quat_to_matrix(quat_from_ypr(0.1, -1.5, 0.05))).T
    t_f = np.arange(0, 60, 1 / 50)
    body = np.column_stack([
        np.convolve(rng.normal(0, 1, len(t_f)), np.ones(20) / 20, "same")
        for _ in range(3)])
    shift = 4.2
    t_m = np.arange(0, 40, 1 / 30)
    cam = np.column_stack([
        np.interp(t_m + shift, t_f, (body @ R_map.T)[:, i]) for i in range(3)])
    ypr, R_est, rms = mount.estimate_mount_from_logs(t_f, body, t_m, cam,
                                                     shift)
    np.testing.assert_allclose(R_est, R_map, atol=0.05)


def test_aruco_tracking(tmp_path):
    """Render ArUco markers into a short video, track them."""
    from imageanalysis_tpu.video import aruco as aruco_mod

    aruco = cv2.aruco
    dic = aruco.getPredefinedDictionary(aruco.DICT_4X4_50)
    marker = aruco.generateImageMarker(dic, 7, 120)
    path = str(tmp_path / "ar.mp4")
    w = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 30, (640, 480))
    for i in range(12):
        frame = np.full((480, 640), 180, np.uint8)
        x = 100 + i * 8
        frame[180:300, x:x + 120] = marker
        w.write(cv2.cvtColor(frame, cv2.COLOR_GRAY2BGR))
    w.release()
    K = np.array([[600.0, 0, 320], [0, 600.0, 240], [0, 0, 1]])
    recs = aruco_mod.track_video(path, K, np.zeros(5), marker_len_m=0.1)
    assert len(recs) >= 8
    assert all(r[2] == 7 for r in recs)
    # marker moves right → tx increases
    txs = [r[4][0] for r in recs]
    assert txs[-1] > txs[0]
    out = str(tmp_path / "ar.csv")
    aruco_mod.write_csv(recs, out)
    assert os.path.getsize(out) > 100


def test_zooniverse_chop(tmp_path, rng):
    from imageanalysis_tpu.apps import zooniverse
    from imageanalysis_tpu.io.project import ProjectMgr

    proj_dir = tmp_path / "p"
    proj_dir.mkdir()
    img = rng.integers(0, 255, (700, 900), np.uint8)
    cv2.imwrite(str(proj_dir / "IMG_0000.jpg"), img)
    proj = ProjectMgr(str(proj_dir), create=True)
    from imageanalysis_tpu.io.project import ImageRecord
    rec = ImageRecord(proj.analysis_dir, "IMG_0000")
    rec.set_size(900, 700)
    rec.save_meta()
    out = tmp_path / "tiles"
    manifest = zooniverse.chop(str(proj_dir), str(out), tile=512, overlap=64)
    assert len(manifest) >= 4
    assert os.path.isfile(out / "tiles.csv")
    t0 = manifest[0]
    timg = cv2.imread(str(out / t0[0]), cv2.IMREAD_GRAYSCALE)
    src = img[t0[3]:t0[3] + 512, t0[2]:t0[2] + 512]
    assert timg.shape == src.shape
    # jpeg-lossy comparison
    assert np.abs(timg.astype(int) - src.astype(int)).mean() < 20


def test_stabilize_video(tmp_path, rng):
    """A shaky pan gets smoother after stabilization."""
    from imageanalysis_tpu.video import stabilize
    from imageanalysis_tpu.video.frame_motion import estimate_motion

    base = cv2.GaussianBlur(rng.uniform(0, 255, (600, 800)).astype(np.float32),
                            (0, 0), 2)
    base = cv2.normalize(base, None, 0, 255, cv2.NORM_MINMAX).astype(np.uint8)
    path = str(tmp_path / "shaky.mp4")
    w = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 30, (400, 300))
    for i in range(40):
        # smooth pan + high-frequency jitter
        dx = i * 3 + rng.normal(0, 4)
        dy = rng.normal(0, 4)
        M = np.float32([[1, 0, -dx], [0, 1, -dy]])
        fr = cv2.warpAffine(base, M, (400, 300))
        w.write(cv2.cvtColor(fr, cv2.COLOR_GRAY2BGR))
    w.release()

    out = str(tmp_path / "stable.mp4")
    n = stabilize.stabilize_video(path, out, sigma_frames=8.0)
    assert n >= 35
    # jitter metric: std of per-frame dx after removing the linear pan
    def jitter(p):
        recs = estimate_motion(p)
        tx = np.array([r[3] for r in recs])
        t = np.arange(len(tx))
        resid = tx - np.polyval(np.polyfit(t, tx, 1), t)
        return resid.std()
    assert jitter(out) < jitter(path) * 0.6
