import os

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")


def test_vignette_and_zip(tmp_path, rng):
    from imageanalysis_tpu.apps import utils

    proj = tmp_path / "proj"
    proj.mkdir()
    # images with strong radial falloff
    h, w = 240, 320
    yy, xx = np.mgrid[0:h, 0:w]
    r = np.hypot(yy - h / 2, xx - w / 2)
    falloff = 1.0 - 0.5 * (r / r.max()) ** 2
    for i in range(4):
        img = (rng.uniform(100, 200, (h, w)) * falloff).astype(np.uint8)
        cv2.imwrite(str(proj / f"IMG_{i:02d}.jpg"), img)
    rc = utils.main(["vignette", str(proj)])
    assert rc == 0
    vig = cv2.imread(str(proj / "ImageAnalysis" / "vignette.png"),
                     cv2.IMREAD_GRAYSCALE)
    assert vig is not None
    # center brighter than corners in the mask
    assert vig[h // 2, w // 2] > vig[5, 5] + 30

    os.chdir(tmp_path)
    rc = utils.main(["zip", str(proj)])
    assert rc == 0
    zips = [f for f in os.listdir(tmp_path) if f.endswith(".zip")]
    assert zips


def test_merge_projects(tmp_path, rng):
    from imageanalysis_tpu.apps import utils

    header = ("File Name,Lat (decimal degrees),Lon (decimal degrees),"
              "Alt (meters MSL),Roll (decimal degrees),"
              "Pitch (decimal degrees),Yaw (decimal degrees)")
    for pi in range(2):
        d = tmp_path / f"p{pi}"
        d.mkdir()
        rows = []
        for i in range(3):
            name = f"P{pi}_{i}.jpg"
            cv2.imwrite(str(d / name), rng.integers(0, 255, (40, 60),
                                                    np.uint8))
            rows.append(f"{name},44.97,-93.26,300,0,0,0")
        (d / "pix4d.csv").write_text(header + "\n" + "\n".join(rows) + "\n")
    out = tmp_path / "merged"
    rc = utils.main(["merge", str(out), str(tmp_path / "p0"),
                     str(tmp_path / "p1")])
    assert rc == 0
    assert len([f for f in os.listdir(out) if f.endswith(".jpg")]) == 6
    lines = (out / "pix4d.csv").read_text().splitlines()
    assert len(lines) == 7


def test_calibrate_chessboard(tmp_path):
    """Render synthetic chessboard views, recover K."""
    from imageanalysis_tpu.apps import utils

    K_true = np.array([[600.0, 0, 320], [0, 600.0, 240], [0, 0, 1]])
    pattern = (9, 6)
    sq = 25.0
    board = np.zeros(((pattern[1] + 1) * 60, (pattern[0] + 1) * 60), np.uint8)
    for r in range(pattern[1] + 1):
        for c in range(pattern[0] + 1):
            if (r + c) % 2 == 0:
                board[r * 60:(r + 1) * 60, c * 60:(c + 1) * 60] = 255
    img_dir = tmp_path / "cal"
    img_dir.mkdir()
    rng2 = np.random.default_rng(0)
    for i in range(8):
        # random mild homography of the board into the camera view
        rvec = rng2.normal(0, 0.25, 3)
        tvec = np.array([rng2.normal(-20, 10), rng2.normal(-20, 10),
                         rng2.uniform(500, 800)])
        R, _ = cv2.Rodrigues(rvec)
        # board plane points: x=c*sq/?, use pixels→mm scale 60px=25mm
        Hb = K_true @ np.column_stack([R[:, 0] * (sq / 60), R[:, 1] * (sq / 60),
                                       R @ np.array([-120 * sq / 60,
                                                     -90 * sq / 60, 0])
                                       + tvec])
        view = cv2.warpPerspective(board, Hb / Hb[2, 2], (640, 480),
                                   borderValue=128)
        cv2.imwrite(str(img_dir / f"cal_{i:02d}.png"), view)
    rc = utils.main(["calibrate", "--images", str(img_dir),
                     "--pattern", "9x6", "--square-mm", "25"])
    assert rc == 0


def test_inspect_tools(tmp_path, capsys):
    """Run inspect subcommands against a tiny processed mission."""
    from imageanalysis_tpu.apps import inspect as insp, process
    from imageanalysis_tpu.io import camera_db
    from imageanalysis_tpu.testing.synthetic import SyntheticMission

    proj_dir = str(tmp_path / "m")
    m = SyntheticMission(proj_dir, n_images=3, img_size=(640, 480),
                         altitude=90.0, spacing=12.0, seed=5)
    m.generate()
    db = str(tmp_path / "cams")
    camera_db.save("Synthetic_TestCam_none", m.camera_config(), db)
    rc = process.main([proj_dir, "--camera", "Synthetic_TestCam_none",
                       "--camera-db", db, "--scale", "1.0", "--ground", "0.0",
                       "--batch-size", "2", "--min-chain-len", "2"])
    assert rc == 0

    out_png = str(tmp_path / "feat.png")
    assert insp.main(["features", proj_dir, "IMG_0000", "--out", out_png]) == 0
    assert os.path.getsize(out_png) > 1000
    out_pair = str(tmp_path / "pair.png")
    assert insp.main(["pair", proj_dir, "IMG_0000", "IMG_0001",
                      "--out", out_pair]) == 0
    assert insp.main(["matches", proj_dir]) == 0
    out = capsys.readouterr().out
    assert "chains" in out


def test_coverage_helpers():
    from imageanalysis_tpu.surface import coverage

    g1 = [[0, 0, 0], [10, 0, 0], [10, 20, 0], [0, 20, 0]]
    g2 = [[5, 10, 0], [25, 10, 0], [25, 30, 0], [5, 30, 0], [np.nan] * 3]
    r1 = coverage.image_coverage(g1)
    r2 = coverage.image_coverage(g2)
    assert r1 == (0, 0, 10, 20)
    u = coverage.coverage_union([r1, r2])
    assert u == (0, 0, 25, 30)
    hits = coverage.images_covering_point({"a": r1, "b": r2}, 7, 15)
    assert hits == ["a", "b"]
    lla = coverage.coverage_lla(r1, (44.97, -93.26, 0.0))
    assert lla[0] < lla[2] and lla[1] < lla[3]


@pytest.fixture(scope="module")
def util_mission(tmp_path_factory):
    """One processed tiny mission shared by the 99-* utility tests."""
    from imageanalysis_tpu.apps import process
    from imageanalysis_tpu.io import camera_db
    from imageanalysis_tpu.testing.synthetic import SyntheticMission

    proj_dir = str(tmp_path_factory.mktemp("util") / "m")
    m = SyntheticMission(proj_dir, n_images=3, img_size=(640, 480),
                         altitude=90.0, spacing=12.0, seed=6)
    m.generate()
    db = str(tmp_path_factory.mktemp("cams"))
    camera_db.save("Synthetic_TestCam_none", m.camera_config(), db)
    rc = process.main([proj_dir, "--camera", "Synthetic_TestCam_none",
                       "--camera-db", db, "--scale", "1.0", "--ground", "0.0",
                       "--batch-size", "2", "--min-chain-len", "2"])
    assert rc == 0
    return proj_dir


def test_utils_import_annotations_and_preview_crops(util_mission, tmp_path):
    """CSV annotation import → preview crops + leaflet map (reference
    99-import-annotations.py + 99-gen-preview-crops.py)."""
    import json

    from imageanalysis_tpu.apps import utils
    from imageanalysis_tpu.io.project import ProjectMgr

    proj = ProjectMgr(util_mission)
    proj.load_images_info()
    lat, lon, _ = proj.ned_reference_lla()
    csv_path = tmp_path / "ann.csv"
    csv_path.write_text(
        "OBJECTID,Latitude,Longitude,Altitude\n"
        f"7,{lat:.8f},{lon:.8f},0.0\n")
    assert utils.main(["import-annotations", util_mission,
                       str(csv_path)]) == 0
    ann = os.path.join(util_mission, "ImageAnalysis", "annotations.json")
    root = json.load(open(ann))
    assert root["markers"][0]["id"] == 7

    assert utils.main(["preview-crops", util_mission, "--size", "64"]) == 0
    pdir = os.path.join(util_mission, "ImageAnalysis", "annotations-preview")
    crops = [f for f in os.listdir(pdir) if f.endswith(".jpg")]
    assert len(crops) == 1
    assert os.path.isfile(os.path.join(pdir, "index.html"))
    html = open(os.path.join(pdir, "index.html")).read()
    assert "L.marker" in html and crops[0] in html


def test_utils_est_cam_transform(util_mission, capsys):
    from imageanalysis_tpu.apps import utils

    assert utils.main(["est-cam-transform", util_mission]) == 0
    out = capsys.readouterr().out
    assert "average transform euler ypr" in out
    assert "IMG_0000" in out


def test_utils_plot_matches_and_trim_far(util_mission, tmp_path, capsys):
    from imageanalysis_tpu.apps import utils

    out = str(tmp_path / "graph.png")
    assert utils.main(["plot-matches", util_mission, "--out", out]) == 0
    assert os.path.getsize(out) > 5000
    # trim-far in list mode touches nothing
    before = sorted(os.listdir(util_mission))
    assert utils.main(["trim-far", util_mission]) == 0
    assert sorted(os.listdir(util_mission)) == before
    assert "IMG_0000" in capsys.readouterr().out


def test_utils_renumber_tools(tmp_path):
    """add-to-name dry-run/write + copy-and-add (99-add-to-name.py,
    99-copy-and-add.py)."""
    from imageanalysis_tpu.apps import utils

    src = tmp_path / "src"
    src.mkdir()
    for i in range(3):
        (src / f"IMG_{i:04d}.jpg").write_bytes(b"x" * 10)
    f0 = str(src / "IMG_0000.jpg")
    # dry run leaves files alone
    assert utils.main(["add-to-name", "--add", "100", f0]) == 0
    assert os.path.isfile(f0)
    assert utils.main(["add-to-name", "--add", "100", "--write", f0]) == 0
    assert not os.path.isfile(f0)
    assert os.path.isfile(str(src / "IMG_0100.jpg"))

    dest = tmp_path / "dest"
    assert utils.main(["copy-and-add", "--src", str(src), "--dest",
                       str(dest), "--add", "1000"]) == 0
    names = sorted(os.listdir(dest))
    assert names == ["IMG_1001.jpg", "IMG_1002.jpg", "IMG_1100.jpg"]


def test_utils_capture_dates_and_wx(util_mission, capsys, monkeypatch,
                                    tmp_path):
    from imageanalysis_tpu.apps import utils

    assert utils.main(["capture-dates", util_mission]) == 0
    out = capsys.readouterr().out
    assert "IMG_0000" in out
    # wx-report: synthetic images have no geotag EXIF → graceful exit
    monkeypatch.setenv("HOME", str(tmp_path))
    rc = utils.main(["wx-report", util_mission])
    assert rc in (0, 1)


def test_review_session_keyboard_triage(util_mission):
    """The d/q keyboard triage (reference 3e-review-matches.py,
    4b-mre-by-image --interactive) driven headless via an injected key
    script: 'd' on the first (weakest) pair removes its matches from the
    .match files; 'q' leaves the rest untouched."""
    from imageanalysis_tpu.apps import inspect as insp
    from imageanalysis_tpu.io.project import ProjectMgr

    proj = ProjectMgr(util_mission)
    proj.load_images_info()
    sess = insp.ReviewSession(proj, mode="pairs")
    assert len(sess.items) >= 2
    # weakest-first ordering
    counts = [len(i1.match_list.get(i2.name, [])) for i1, i2 in sess.items]
    assert counts == sorted(counts)
    first = sess.items[0]
    n_before = counts[0]
    assert n_before > 0
    assert sess.handle_key("d") is True      # drop weakest, continue
    assert sess.handle_key("q") is False     # quit
    n_removed = sess.apply()
    assert n_removed == n_before
    # the decision persisted to the .match files
    proj2 = ProjectMgr(util_mission)
    proj2.load_images_info()
    i1 = proj2.image_by_name(first[0].name)
    i1.load_matches()
    assert i1.match_list.get(first[1].name, []) == []
    # survivors untouched
    other = sess.items[1]
    o1 = proj2.image_by_name(other[0].name)
    o1.load_matches()
    assert len(o1.match_list.get(other[1].name, [])) > 0

    # by-image mode through the CLI with a scripted key sequence: 'q'
    # immediately → nothing else deleted
    assert insp.main(["review", util_mission, "--by-image",
                      "--keys", "q"]) == 0
