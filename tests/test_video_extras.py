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


# ---------------------------------------------------------------------------
# Extended HUD symbology (reference hud.py:339-1032) — one frame-render
# test per instrument group.
# ---------------------------------------------------------------------------

def _hud_fixture():
    import numpy as np

    from imageanalysis_tpu.core import rotations as rot
    from imageanalysis_tpu.video import camera as vc, hud as hud_mod

    cam = vc.VirtualCamera({
        "K": [500.0, 0, 320, 0, 500.0, 240, 0, 0, 1],
        "dist_coeffs": [0] * 5, "width_px": 640, "height_px": 480})
    h = hud_mod.HUD(cam)
    q = np.asarray(rot.quat_from_ypr(0.0, 0.0, 0.0))
    h.update_state(ned=[0.0, 0.0, -120.0], quat=q, ypr_deg=(0.0, 0.0, 0.0),
                   vel_ned=[20.0, 0.0, 0.0])
    return h


def _drawn_pixels(frame):
    return int((frame.sum(axis=2) > 30).sum())


def test_hud_astro_sun_moon():
    """Sun/moon markers from the Meeus ephemeris (hud.py:189-213, 594-618)."""
    import datetime
    import numpy as np

    h = _hud_fixture()
    base = np.zeros((480, 640, 3), np.uint8)
    t = datetime.datetime(2023, 6, 21, 18, 0,
                          tzinfo=datetime.timezone.utc).timestamp()
    h.update_lla([45.0, -93.0, 300.0])
    h.update_time(100.0, unixtime=t)
    h.set_ned_ref(45.0, -93.0, 0.0)
    # point the boresight straight at the sun so the marker is in-frame
    from imageanalysis_tpu.core import rotations as rot
    from imageanalysis_tpu.video import ephemeris as eph
    sun, _ = eph.sun_moon_ned(-93.0, 45.0, 300.0, t)
    az = np.degrees(np.arctan2(sun[1], sun[0]))
    alt = np.degrees(np.arcsin(-sun[2]))
    q = np.asarray(rot.quat_from_ypr(np.radians(az), np.radians(alt), 0.0))
    h.update_state(ned=[0.0, 0.0, -120.0], quat=q, ypr_deg=(az, alt, 0.0),
                   vel_ned=[20.0, 0.0, 0.0])
    frame = base.copy()
    h.draw_astro(frame, cv2)
    # late-afternoon local sun is up and west — something must be drawn
    assert _drawn_pixels(frame) > 20

    from imageanalysis_tpu.video import ephemeris
    sun, moon = ephemeris.sun_moon_ned(-93.0, 45.0, 300.0, t)
    assert sun[2] < 0          # above horizon (NED down negative)
    assert abs(np.linalg.norm(sun) - 1) < 1e-9
    assert abs(np.linalg.norm(moon) - 1) < 1e-9


def test_hud_airports(tmp_path):
    """Airport DB load + labeled point rendering (airports.py, hud.py:619)."""
    import numpy as np

    csv_path = tmp_path / "apt.csv"
    csv_path.write_text(
        "Ident,Lat,Lon,Alt\n"
        "KMSP,44.8820,-93.2218,256\n"
        "FAR_AWAY,0.0,0.0,10\n")
    h = _hud_fixture()
    h.set_ned_ref(44.88, -93.22, 0.0)
    # aircraft ~800 m south of the airport, high enough that the marker
    # projects a few degrees below the horizon (visible in-frame)
    h.update_state(ned=[-800.0, 0.0, -300.0], quat=h.quat,
                   ypr_deg=(0.0, 0.0, 0.0), vel_ned=[20.0, 0.0, 0.0])
    h.load_airports(str(csv_path), range_m=30000.0)
    assert len(h.airports) == 1 and h.airports[0][0] == "KMSP"
    frame = np.zeros((480, 640, 3), np.uint8)
    h.draw_airports(frame, cv2)
    assert _drawn_pixels(frame) > 10


def test_hud_track_and_features():
    """Breadcrumb track + feature overlays (hud.py:897-956)."""
    import numpy as np

    h = _hud_fixture()
    # track ahead of the aircraft so it projects in-frame
    for t in range(20):
        h.update_ned_history(float(t), [100.0 + 20.0 * t, 5.0 * t, -110.0])
    h.update_features([[400.0, e * 20.0, 0.0] for e in range(-5, 6)])
    frame = np.zeros((480, 640, 3), np.uint8)
    h.draw_track(frame, cv2)
    n_track = _drawn_pixels(frame)
    h.draw_features(frame, cv2)
    assert n_track > 10
    assert _drawn_pixels(frame) > n_track


def test_hud_autopilot_group():
    """Flight director vbars, heading bug, bird, course (hud.py:376-502) in
    auto mode; nose circles in manual (hud.py:623-634)."""
    import numpy as np

    h = _hud_fixture()
    h.update_ap("auto", ap_roll=10.0, ap_pitch=5.0, ap_hdg=20.0,
                ap_speed=25.0, ap_alt=150.0)
    frame = np.zeros((480, 640, 3), np.uint8)
    h.draw_vbars(frame, cv2)
    h.draw_heading_bug(frame, cv2)
    h.draw_bird(frame, cv2)
    h.draw_course(frame, cv2)
    assert _drawn_pixels(frame) > 100

    h2 = _hud_fixture()
    h2.update_ap("manual")
    frame2 = np.zeros((480, 640, 3), np.uint8)
    h2.draw_nose(frame2, cv2)
    assert _drawn_pixels(frame2) > 20


def test_hud_sticks_time_compass_alpha_beta():
    """Fixed symbols: sticks, time, compass points, alpha/beta marker
    (hud.py:339-367, 559-592, 835-882)."""
    import numpy as np

    h = _hud_fixture()
    h.update_pilot(0.3, -0.2, 0.7, 0.1)
    h.update_time(42.5)
    h.update_airdata(alpha_rad=0.05, beta_rad=0.02)
    h.show_compass = True
    frame = np.zeros((480, 640, 3), np.uint8)
    h.draw_sticks(frame, cv2)
    n1 = _drawn_pixels(frame)
    assert n1 > 100
    h.draw_time(frame, cv2)
    h.draw_compass_points(frame, cv2)
    h.draw_alpha_beta_marker(frame, cv2)
    assert _drawn_pixels(frame) > n1


def test_hud_full_draw_with_everything():
    """The composed draw() with all optional state set renders every group
    without error (hud.py:1034 draw)."""
    import datetime
    import numpy as np

    h = _hud_fixture()
    h.update_lla([45.0, -93.0, 300.0])
    t = datetime.datetime(2023, 6, 21, 18, 0,
                          tzinfo=datetime.timezone.utc).timestamp()
    h.update_time(10.0, unixtime=t)
    h.set_ned_ref(45.0, -93.0, 0.0)
    h.update_ap("auto", ap_roll=5.0, ap_pitch=3.0, ap_hdg=15.0)
    h.update_act(0.1, 0.1, 0.5, 0.0)
    h.update_airdata(alpha_rad=0.03, beta_rad=0.01)
    h.update_features([[300.0, 0.0, 0.0]])
    for t2 in range(10):
        h.update_ned_history(float(t2), [100.0 + 30.0 * t2, 0.0, -110.0])
    h.show_compass = True
    h.show_grid = True
    frame = np.zeros((480, 640, 3), np.uint8)
    out = h.draw(frame)
    assert _drawn_pixels(out) > 1000


def test_ephemeris_known_sky():
    """Meeus sun/moon against known sky geometry: equinox noon sun due
    south at (90° − lat) altitude; documented full moon ~180° from the
    sun; midnight sun well below the horizon."""
    import datetime

    from imageanalysis_tpu.video import ephemeris as eph

    t = datetime.datetime(2000, 3, 20, 12, 7,
                          tzinfo=datetime.timezone.utc).timestamp()
    jd = eph._julian_day(t)
    ra, dec = eph.sun_radec(jd)
    az, alt = eph.radec_to_azalt(ra, dec, 51.48, 0.0, jd)
    assert abs(dec) < 0.5                      # equinox: sun on the equator
    assert 170 < az < 190                      # due south from Greenwich
    assert abs(alt - (90 - 51.48)) < 1.5

    t2 = datetime.datetime(2000, 3, 20, 0, 0,
                           tzinfo=datetime.timezone.utc).timestamp()
    jd2 = eph._julian_day(t2)
    ra2, dec2 = eph.sun_radec(jd2)
    _, alt2 = eph.radec_to_azalt(ra2, dec2, 51.48, 0.0, jd2)
    assert alt2 < -30

    # full moon of 2015-07-02 02:20 UTC: elongation ≈ 180°
    t3 = datetime.datetime(2015, 7, 2, 2, 20,
                           tzinfo=datetime.timezone.utc).timestamp()
    jd3 = eph._julian_day(t3)
    sra, _ = eph.sun_radec(jd3)
    mra, _ = eph.moon_radec(jd3)
    assert 170 < (mra - sra) % 360 < 190


def test_hud_glass_dg():
    """Glass directional gyro renders rose + nose + bug + course arrow
    (hud_glass.py:584-712)."""
    import numpy as np

    h = _hud_fixture()
    h.style = "glass"
    h.update_ap("auto", ap_hdg=45.0)
    h._vel_filt = np.array([20.0, 5.0, 0.0])
    frame = np.zeros((480, 640, 3), np.uint8)
    h.draw_dg(frame, cv2)
    assert _drawn_pixels(frame) > 500
    # rose is at the bottom center
    assert (frame[430:480, 260:380].sum(axis=2) > 30).sum() > 200


def test_flight_data_tables(tmp_path):
    """Correction/feature/horizon log tables (reference correction.py,
    feat_data.py, horiz_data.py): load, sanitize, smooth, interpolate."""
    import numpy as np

    from imageanalysis_tpu.video import flight_data as fd

    # attitude correction horiz CSV with one outlier to sanitize
    t = np.arange(0, 20, 0.1)
    roll = 0.02 * np.sin(t) + 0.002 * np.sin(20 * t)
    pitch = 0.01 * np.cos(t)
    roll[50] = 0.5          # > 0.08 rad → zeroed
    horiz = tmp_path / "horiz.csv"
    with open(horiz, "w") as f:
        f.write("flight time (sec),ekf roll error (rad),ekf pitch error (rad)\n")
        for i in range(len(t)):
            f.write(f"{t[i]:.2f},{roll[i]:.6f},{pitch[i]:.6f}\n")
    corr = fd.AttitudeCorrection().load_horiz(str(horiz))
    q = corr.query(5.0)
    assert abs(q["roll_rad"] - 0.02 * np.sin(5.0)) < 0.01
    assert abs(corr.query(5.05)["roll_rad"]) < 0.08  # outlier suppressed
    assert q["north_m"] == 0.0

    # legacy table
    old = tmp_path / "old.txt"
    old.write_text("0.0 0.1 0.2 0.3 1.0 2.0 3.0\n"
                   "10.0 0.1 0.2 0.3 1.0 2.0 3.0\n")
    corr2 = fd.AttitudeCorrection().load_old(str(old))
    assert corr2.query(5.0)["yaw_rad"] == 0.1
    assert corr2.query(5.0)["east_m"] == 2.0

    # feature rates
    feat = tmp_path / "feat.csv"
    with open(feat, "w") as f:
        f.write("video time,p (rad/sec),q (rad/sec),r (rad/sec),"
                "hp (rad/sec),hq (rad/sec),hr (rad/sec)\n")
        for i in range(len(t)):
            f.write(f"{t[i]:.2f},{0.1*np.sin(t[i]):.6f},0.0,0.0,"
                    f"{0.1*np.sin(t[i]):.6f},0.0,0.0\n")
    fr = fd.FeatureRates().load(str(feat)).smooth(2.0).make_interp()
    p, qr, r = fr.query_rates(np.pi / 2)
    assert abs(p - 0.1) < 0.02
    assert r == 0.0

    # horizon log + finite-difference rates
    hor = tmp_path / "hor.csv"
    with open(hor, "w") as f:
        f.write("video time,camera roll (deg),camera pitch (deg)\n")
        for i in range(len(t)):
            f.write(f"{t[i]:.2f},{10*np.sin(t[i]):.4f},{2*t[i]:.4f}\n")
    hl = fd.HorizonLog().load(str(hor)).make_rates()
    # pitch rate = 2 deg/s everywhere
    assert abs(np.median(hl.q) - 2.0 * np.pi / 180.0) < 1e-3
    r_i, p_i = hl.interp_attitude()
    assert abs(r_i(np.pi / 2) - 10.0) < 0.1


def test_ils_sun_angle_correction():
    """ILS sun-angle correction (reference illumintation-sensor-test.py):
    a level aircraft at local noon sees a small sun angle; a banked one
    sees a larger angle and gets a >1 correction factor."""
    import datetime

    from imageanalysis_tpu.video import ils

    t = datetime.datetime(2023, 6, 21, 17, 0,
                          tzinfo=datetime.timezone.utc).timestamp()
    ang_level = ils.sun_angle_deg(45.0, -93.0, 300.0, (0.0, 0.0, 0.0), t)
    ang_banked = ils.sun_angle_deg(45.0, -93.0, 300.0, (0.0, 0.0, 40.0), t)
    assert 0 < ang_level < 45          # near-noon summer sun is high
    assert ang_banked != ang_level

    rows = [("a.jpg", 45.0, -93.0, 300.0, 0.0, 0.0, 0.0, 1000.0),
            ("b.jpg", 45.0, -93.0, 300.0, 0.0, 0.0, 40.0, 700.0)]
    table = ils.correction_factors(rows, t)
    assert len(table) == 2
    names = [r[0] for r in table]
    assert names == ["a.jpg", "b.jpg"]
    for _, ang, raw, factor in table:
        assert factor > 0
