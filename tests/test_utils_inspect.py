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
