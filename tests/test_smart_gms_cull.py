import numpy as np
import jax
import jax.numpy as jnp
import pytest

cv2 = pytest.importorskip("cv2")


def test_gms_filter_keeps_coherent(rng):
    """Coherent motion survives GMS; scattered false matches die."""
    from imageanalysis_tpu.ops.gms import gms_filter

    n_good, n_bad, npad = 600, 120, 1024
    uv_a = np.zeros((npad, 2), np.float32)
    uv_b = np.zeros((npad, 2), np.float32)
    valid = np.zeros(npad, bool)
    # coherent cluster: smooth translation field
    uv_a[:n_good] = rng.uniform([0, 0], [2000, 1500], (n_good, 2))
    uv_b[:n_good] = uv_a[:n_good] + np.array([120.0, -60.0]) \
        + rng.normal(0, 2, (n_good, 2))
    # scattered garbage
    uv_a[n_good:n_good + n_bad] = rng.uniform([0, 0], [2000, 1500], (n_bad, 2))
    uv_b[n_good:n_good + n_bad] = rng.uniform([0, 0], [2000, 1500], (n_bad, 2))
    valid[:n_good + n_bad] = True
    keep = np.asarray(gms_filter(jnp.asarray(uv_a), jnp.asarray(uv_b),
                                 jnp.asarray(valid),
                                 jnp.asarray([2000.0, 1500.0]),
                                 jnp.asarray([2000.0, 1500.0])))
    assert keep[:n_good].mean() > 0.85
    assert keep[n_good:n_good + n_bad].mean() < 0.25
    assert not keep[n_good + n_bad:].any()


def test_cull_delete_marked():
    from imageanalysis_tpu.apps import cull

    matches = [
        [[0, 0, 0], -1, [0, [1, 1]], [1, [2, 2]], [2, [3, 3]], [3, [4, 4]]],
        [[0, 0, 0], -1, [0, [5, 5]], [1, [6, 6]], [2, [7, 7]]],
        [[0, 0, 0], -1, [0, [8, 8]], [1, [9, 9]], [2, [1, 2]]],
    ]
    # drop one obs from chain 0 (survives), one from chain 1 (falls below 3)
    out = cull.delete_marked(matches, [(0, 1), (1, 0)], min_chain_len=3)
    assert len(out) == 2
    assert len(out[0]) == 2 + 3
    assert out[1] is matches[2]
    out2 = cull.delete_marked(matches, [(0, 1)], strong=True)
    assert len(out2) == 2


def test_cull_remove_camera():
    from imageanalysis_tpu.apps import cull

    matches = [
        [[0, 0, 0], -1, [0, [1, 1]], [1, [2, 2]], [2, [3, 3]], [3, [4, 4]]],
        [[0, 0, 0], -1, [0, [5, 5]], [1, [6, 6]], [2, [7, 7]]],
    ]
    out = cull.remove_camera_matches(matches, 1, min_chain_len=3)
    assert len(out) == 1
    assert all(o[0] != 1 for o in out[0][2:])


def test_smart_state_surface_and_yaw(tmp_path):
    from imageanalysis_tpu.match.smart import SmartState

    s = SmartState(str(tmp_path))
    s.update_surface_pair("a", "b", 102.0, 3.0, 20.0)
    s.update_surface_pair("a", "c", 98.0, 2.0, 20.0)
    s.update_surface_pair("a", "d", 400.0, 80.0, 20.0)  # distrusted (std>25)
    assert abs(s.node("a")["tri_surface_m"] - 100.0) < 0.2
    assert s.get_surface("a", "b") == pytest.approx(
        (s.node("a")["tri_surface_m"] + s.node("b")["tri_surface_m"]) / 2)
    s.update_yaw_pair("a", "b", 5.0, 10.0, 45.0, 2.0)
    s.update_yaw_pair("a", "c", 3.0, 10.0, 45.0, 2.0)
    s.update_yaw_pair("a", "d", 170.0, 10.0, 45.0, 2.0)  # rejected (>30°)
    assert s.get_yaw_error("a") == pytest.approx(4.0, abs=0.1)
    s.save()
    s2 = SmartState(str(tmp_path))
    assert s2.get_yaw_error("a") == pytest.approx(4.0, abs=0.1)


def test_smart_estimators_on_synthetic(rng):
    """Surface elevation estimate from a planted two-view scene."""
    from imageanalysis_tpu.core import camera as cam, rotations as rot
    from imageanalysis_tpu.match import smart as smart_mod

    K = np.array([[1500.0, 0, 1000], [0, 1500.0, 750], [0, 0, 1]], np.float32)

    class FakeImage:
        def __init__(self, name, ned, quat, kp):
            self.name = name
            self._ned = ned
            self._quat = quat
            self.kp = kp
            self.match_list = {}

        def get_camera_pose(self, opt=False):
            return list(self._ned), None, list(self._quat)

        def get_aircraft_pose(self):
            return None, [0.0, 0, 0], None

        def load_features(self):
            pass

    class FakeProj:
        class _Cam(dict):
            def get(self, k, d=None):
                return {"width_px": 2000, "height_px": 1500}.get(k, d)
        camera = _Cam()

        def camera_model(self, optimized=False):
            return cam.CameraModel(K=jnp.asarray(K), dist=jnp.zeros(5))

    # ground at elevation +30 m (down = -30)
    pts = np.c_[rng.uniform(-40, 40, (200, 2)),
                np.full((200, 1), -30.0)].astype(np.float32)
    q = rot.quat_from_ypr(0.0, np.radians(-90.0), 0.0)
    ned1 = np.array([0.0, 0, -130.0])
    ned2 = np.array([20.0, 5, -128.0])
    uvs = []
    for ned in (ned1, ned2):
        R, t = cam.ned_quat_to_rt(jnp.asarray(ned, dtype=jnp.float32),
                                  jnp.asarray(q, dtype=jnp.float32))
        uv, _ = cam.project_points(jnp.asarray(pts), R, t, jnp.asarray(K),
                                   jnp.zeros(5))
        uvs.append(np.asarray(uv).astype(np.float32))
    i1 = FakeImage("i1", ned1, np.asarray(q), uvs[0])
    i2 = FakeImage("i2", ned2, np.asarray(q), uvs[1])
    i1.match_list["i2"] = [[k, k] for k in range(200)]
    avg, std, dist = smart_mod.estimate_surface_elevation(FakeProj(), i1, i2)
    assert abs(avg - 30.0) < 1.0
    assert std < 2.0
    assert abs(dist - np.linalg.norm(ned2 - ned1)) < 1e-3


def test_yaw_error_correction_pipeline(tmp_path):
    """--match-strategy smart corrects a planted heading bias before BA."""
    import numpy as np

    from imageanalysis_tpu.apps import process
    from imageanalysis_tpu.io import camera_db
    from imageanalysis_tpu.io.project import ProjectMgr
    from imageanalysis_tpu.testing.synthetic import SyntheticMission

    proj_dir = str(tmp_path / "m")
    m = SyntheticMission(proj_dir, n_images=5, img_size=(640, 480),
                         altitude=90.0, spacing=12.0, yaw_jitter=0.0, seed=9)
    m.generate()
    # plant a constant heading bias into the pose file (groundtrack-style
    # yaw error): rewrite pix4d.csv yaw column +8 degrees
    pix4d = tmp_path / "m" / "pix4d.csv"
    lines = pix4d.read_text().splitlines()
    out = [lines[0]]
    for ln in lines[1:]:
        f = ln.split(",")
        f[6] = "%.2f" % (float(f[6]) + 8.0)
        out.append(",".join(f))
    pix4d.write_text("\n".join(out) + "\n")

    db = str(tmp_path / "cams")
    camera_db.save("Synthetic_TestCam_none", m.camera_config(), db)
    rc = process.main([proj_dir, "--camera", "Synthetic_TestCam_none",
                       "--camera-db", db, "--scale", "1.0", "--ground", "0.0",
                       "--batch-size", "2", "--min-chain-len", "2",
                       "--match-strategy", "smart"])
    assert rc == 0
    proj = ProjectMgr(proj_dir)
    proj.load_images_info()
    # the smart pass should have detected and removed most of the +8° bias
    errs = [im.node.node("aircraft_pose").get("yaw_error_deg", 0.0)
            for im in proj.image_list]
    applied = [e for e in errs if abs(e) > 1.0]
    assert len(applied) >= 3, errs
    assert np.median([e for e in errs if e]) < -4.0, errs


class _CullProj:
    """Minimal ProjectMgr stand-in for the 4c cull estimators."""

    class _Img:
        def __init__(self, name, ned):
            self.name = name
            self._ned = ned

        def has_opt_pose(self):
            return True

        def get_camera_pose(self, opt=False):
            return list(self._ned), None, [1.0, 0.0, 0.0, 0.0]

    def __init__(self, cam_neds):
        self.image_list = [self._Img(f"img{i}", n)
                           for i, n in enumerate(cam_neds)]


def _chain(pt, obs):
    return [list(pt), -1] + [[img, [float(u), float(v)]]
                             for img, (u, v) in obs]


def test_cull_depth_outliers():
    """4c-by-depth: a chain triangulated far from the per-image mean
    depth is marked (reference 4c-by-depth.py:66-130)."""
    from imageanalysis_tpu.apps import cull

    cams = [[i * 10.0, 0.0, -100.0] for i in range(4)]
    proj = _CullProj(cams)
    matches = []
    rng = np.random.default_rng(0)
    for k in range(30):
        x = rng.uniform(0, 30)
        y = rng.uniform(-5, 5)
        matches.append(_chain([x, y, rng.normal(0, 1)],
                              [(k % 3, (10, 10)), (k % 3 + 1, (20, 20))]))
    # outlier: point "below ground" by 300 m → depth ~400 vs ~100
    matches.append(_chain([15.0, 0.0, 300.0], [(1, (5, 5)), (2, (6, 6))]))
    marked = cull.mark_depth_outliers(proj, matches, stddev=3.0)
    assert len(matches) - 1 in marked
    assert len(marked) <= 2


def test_cull_movers_small_angle_pairs():
    """4c-movers: colocated camera pair (tiny subtended angles) has all
    its observations marked; a well-separated pair does not."""
    from imageanalysis_tpu.apps import cull

    # cams 0,1 colocated (0.1 m apart); cams 2,3 separated by 40 m
    proj = _CullProj([[0, 0, -100], [0.1, 0, -100],
                      [100, 0, -100], [140, 0, -100]])
    matches = []
    for k in range(10):
        matches.append(_chain([k, 0, 0], [(0, (1, 1)), (1, (2, 2))]))
        matches.append(_chain([100 + k, 0, 0], [(2, (1, 1)), (3, (2, 2))]))
    marked = cull.mark_movers(proj, matches, avg_cutoff_deg=5.0)
    marked_set = set(marked)
    for mi, m in enumerate(matches):
        imgs = {o[0] for o in m[2:]}
        if imgs == {0, 1}:
            assert (mi, 0) in marked_set and (mi, 1) in marked_set
        else:
            assert (mi, 0) not in marked_set


def test_cull_colocated_cams():
    """4c-colocated-cams: pairs with degenerate angle stats are culled."""
    from imageanalysis_tpu.apps import cull

    proj = _CullProj([[0, 0, -100], [0.2, 0, -100],
                      [100, 0, -100], [140, 0, -100]])
    matches = []
    for k in range(10):
        matches.append(_chain([k, 0, 0], [(0, (1, 1)), (1, (2, 2))]))
        matches.append(_chain([100 + k, 0, 0], [(2, (1, 1)), (3, (2, 2))]))
    marked = cull.mark_colocated_cams(proj, matches)
    bad = {mi for mi, _ in marked}
    good_pairs = [mi for mi, m in enumerate(matches)
                  if {o[0] for o in m[2:]} == {2, 3}]
    assert all(mi not in bad for mi in good_pairs)
    coloc = [mi for mi, m in enumerate(matches)
             if {o[0] for o in m[2:]} == {0, 1}]
    assert all(mi in bad for mi in coloc)


def test_cull_surface_outliers():
    """4c-surface-outliers1: a spike point above the local surface is
    removed; smooth terrain survives."""
    from imageanalysis_tpu.apps import cull

    rng = np.random.default_rng(3)
    matches = []
    for i in range(12):
        for j in range(12):
            z = rng.normal(0, 0.3)
            matches.append(_chain([i * 5.0, j * 5.0, z],
                                  [(0, (1, 1)), (1, (2, 2))]))
    # 50 m spike (NED z negative is up; reference uses up = -ned[2])
    matches.append(_chain([27.0, 27.0, -50.0], [(0, (3, 3)), (1, (4, 4))]))
    out, n = cull.cull_surface_outliers(matches, stddev=5.0)
    assert n >= 1
    assert all(abs(m[0][2]) < 10 for m in out)
    assert len(out) >= 140


def test_smart_recovers_where_traditional_degrades(tmp_path):
    """The reference's marquee claim (README-DataSets.md:6-12): with badly
    corrupted headings the smart strategy's yaw-error correction recovers
    accurate camera poses while the traditional strategy is poisoned by
    the bad attitude priors. Planted +20° heading bias; measured r2:
    traditional ≈ 1.9 m mean camera error, smart ≈ 0.22 m."""
    import numpy as np

    from imageanalysis_tpu.apps import process
    from imageanalysis_tpu.io import camera_db
    from imageanalysis_tpu.io.project import ProjectMgr
    from imageanalysis_tpu.testing.synthetic import SyntheticMission

    def run(strategy):
        proj_dir = str(tmp_path / f"m_{strategy}")
        m = SyntheticMission(proj_dir, n_images=5, img_size=(640, 480),
                             altitude=90.0, spacing=12.0, yaw_jitter=0.0,
                             seed=9)
        m.generate()
        pix4d = tmp_path / f"m_{strategy}" / "pix4d.csv"
        lines = pix4d.read_text().splitlines()
        out = [lines[0]]
        for ln in lines[1:]:
            f = ln.split(",")
            f[6] = "%.2f" % (float(f[6]) + 20.0)
            out.append(",".join(f))
        pix4d.write_text("\n".join(out) + "\n")
        db = str(tmp_path / "cams")
        camera_db.save("Synthetic_TestCam_none", m.camera_config(), db)
        rc = process.main([proj_dir, "--camera", "Synthetic_TestCam_none",
                           "--camera-db", db, "--scale", "1.0",
                           "--ground", "0.0", "--batch-size", "2",
                           "--min-chain-len", "2",
                           "--match-strategy", strategy])
        assert rc == 0
        proj = ProjectMgr(proj_dir)
        proj.load_images_info()
        ref = proj.ned_reference_lla()
        true_ned = m.true_camera_ned(ref)
        errs = [np.linalg.norm(
            np.array(im.get_camera_pose(opt=im.has_opt_pose())[0])
            - true_ned[i]) for i, im in enumerate(proj.image_list)]
        return float(np.mean(errs))

    err_trad = run("traditional")
    err_smart = run("smart")
    assert err_smart < 0.6, f"smart failed to recover: {err_smart:.2f} m"
    assert err_trad > 2.0 * err_smart, (
        f"expected traditional to degrade under 20° heading bias: "
        f"traditional={err_trad:.2f} m smart={err_smart:.2f} m")


def test_gated_smart_recovers_repetitive_texture(tmp_path):
    """Tiled-canopy scene (reference README.md:54-58, README-DataSets.md:6-12
    — the datasets 'pix4d is unable to stitch'): the ground texture repeats
    every 35 m, so nearly every SIFT descriptor has a near-identical twin
    one period away and pure ratio-test matching collapses. The smart
    strategy's ground-projected candidate gating (matcher.py
    match_pair_batch_gated — the reference's smart_pair_matches seeding,
    scripts/lib/matcher.py:358-593) excludes the spatially implausible
    twins BEFORE the ratio test and recovers the pair graph + cameras."""
    import numpy as np

    from imageanalysis_tpu.apps import process
    from imageanalysis_tpu.io import camera_db
    from imageanalysis_tpu.io.project import ProjectMgr
    from imageanalysis_tpu.testing.synthetic import SyntheticMission

    def run(strategy):
        proj_dir = str(tmp_path / f"rep_{strategy}")
        # period 140 px × 0.25 m/px = 35 m ⇒ twins sit ~245 px apart in
        # image space, outside the 0.2·diag = 160 px gate
        m = SyntheticMission(proj_dir, n_images=5, img_size=(640, 480),
                             altitude=100.0, spacing=12.0, yaw_jitter=0.0,
                             pos_jitter=0.3, seed=11, texture_period=140)
        m.generate()
        db = str(tmp_path / "cams")
        camera_db.save("Synthetic_TestCam_none", m.camera_config(), db)
        rc = process.main([proj_dir, "--camera", "Synthetic_TestCam_none",
                           "--camera-db", db, "--scale", "1.0",
                           "--ground", "0.0", "--batch-size", "2",
                           "--min-chain-len", "2",
                           "--match-strategy", strategy])
        proj = ProjectMgr(proj_dir)
        proj.load_images_info()
        n_matches = 0
        for im in proj.image_list:
            im.load_matches()
            n_matches += sum(len(v) for v in im.match_list.values())
        if rc != 0:
            return rc, n_matches, np.inf
        ref = proj.ned_reference_lla()
        true_ned = m.true_camera_ned(ref)
        errs = [np.linalg.norm(
            np.array(im.get_camera_pose(opt=im.has_opt_pose())[0])
            - true_ned[i]) for i, im in enumerate(proj.image_list)]
        return rc, n_matches, float(np.mean(errs))

    rc_t, match_t, err_t = run("traditional")
    rc_s, match_s, err_s = run("smart")
    assert rc_s == 0, "smart pipeline failed on repetitive texture"
    assert err_s < 0.8, f"smart failed to recover cameras: {err_s:.2f} m"
    # the ratio test must have collapsed the ungated graph: either the
    # pipeline died (no structure) or the match yield is a fraction of the
    # gated one / the solution is far worse
    assert (rc_t != 0 or match_t < 0.5 * match_s
            or err_t > 2.0 * err_s), (rc_t, match_t, match_s, err_t, err_s)


def test_pair_surface_stats_empty_pairs():
    """A mission where matching found nothing must not crash the smart
    requalification (regression: empty pair list reached the batched
    triangulation and died unpacking a (0,)-shaped quat array)."""
    from imageanalysis_tpu.match import smart

    stats, affines = smart.pair_surface_stats_batched(None, [])
    assert stats == [] and affines == []
