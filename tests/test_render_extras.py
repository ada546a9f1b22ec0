import json
import os
import struct

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")


def test_annotations_roundtrip(tmp_path):
    from imageanalysis_tpu.render.annotations import Annotations

    ref = (44.97, -93.26, 0.0)
    a = Annotations(str(tmp_path), ref, id_prefix="pt")
    a.add_marker_lla(44.971, -93.261, 250.0, "oak tree")
    a.add_marker_ned([100.0, -50.0, -5.0], "shed")
    cams = np.array([[0, 0, -100], [50, 0, -100], [25, 40, -100],
                     [10, 10, -100]], float)
    a.save(camera_positions_ned=cams, mission_name="test")

    for ext in ("json", "csv", "kml"):
        assert os.path.isfile(tmp_path / f"annotations.{ext}")
    with open(tmp_path / "annotations.json") as f:
        root = json.load(f)
    assert root["id_prefix"] == "pt"
    assert len(root["markers"]) == 2

    b = Annotations(str(tmp_path), ref).load()
    assert len(b.markers) == 2
    assert b.markers[0]["comment"] == "oak tree"
    np.testing.assert_allclose(b.markers[1]["ned"][:2], [100.0, -50.0],
                               atol=1e-4)
    kml = (tmp_path / "annotations.kml").read_text()
    assert "<kml" in kml and "pt000" in kml and "LineString" in kml


def test_histogram_matching(tmp_path, rng):
    from imageanalysis_tpu.render import histogram as hist

    # two fake "images" with different brightness
    dark = rng.integers(20, 100, (120, 160, 3)).astype(np.uint8)
    bright = np.clip(dark.astype(int) + 80, 0, 255).astype(np.uint8)

    class FakeIm:
        def __init__(self, name, ned):
            self.name = name
            self._ned = ned

        def get_camera_pose(self, opt=False):
            return self._ned, None, None

    class FakeProj:
        image_list = [FakeIm("a", [0, 0, -100]), FakeIm("b", [10, 0, -100])]

        def image_path(self, im):
            p = str(tmp_path / (im.name + ".jpg"))
            return p

    proj = FakeProj()
    cv2.imwrite(str(tmp_path / "a.jpg"), dark)
    cv2.imwrite(str(tmp_path / "b.jpg"), bright)
    hists = hist.make_histograms(proj)
    templates = hist.make_templates(proj, hists)
    # matching the dark image toward its (bright-dominated) template
    # should raise its mean
    out = hist.match_to_template(dark, hists["a"], templates["a"])
    assert out.mean() > dark.mean() + 15
    hist.save(str(tmp_path), hists, templates)
    h2, t2 = hist.load(str(tmp_path))
    assert set(h2) == {"a", "b"}


def test_ac3d_surface(tmp_path, rng):
    from imageanalysis_tpu.render.ac3d import write_surface_ac

    pts = rng.uniform(-100, 100, (60, 2))
    vals = rng.uniform(-5, 5, 60)
    n_tri = write_surface_ac(str(tmp_path / "surface-global.ac"), pts, vals)
    txt = (tmp_path / "surface-global.ac").read_text()
    assert txt.startswith("AC3Db")
    assert f"numvert {len(pts)}" in txt
    assert n_tri > 50


def test_geotiff_writer(tmp_path, rng):
    from imageanalysis_tpu.render.geotiff import write_geotiff
    from PIL import Image

    mosaic = rng.integers(0, 255, (200, 300, 3)).astype(np.uint8)
    extent = (100.0, -150.0, 200.0, 0.0)  # n_min, e_min, n_max, e_max
    ref = (44.97, -93.26, 0.0)
    path = str(tmp_path / "mosaic.tif")
    write_geotiff(path, mosaic, extent, ref)

    # PIL can read it back (validates baseline TIFF structure)
    with Image.open(path) as im:
        assert im.size == (300, 200)
        arr = np.asarray(im)
    np.testing.assert_array_equal(arr, mosaic[..., ::-1])

    # GeoTIFF tags present with sane values
    with open(path, "rb") as f:
        data = f.read()
    assert struct.unpack("<2sH", data[:4]) == (b"II", 42)
    # ModelPixelScale (33550) and ModelTiepoint (33922) tags exist
    n_dir = struct.unpack("<H", data[8:10])[0]
    tags = {}
    for i in range(n_dir):
        off = 10 + 12 * i
        tag, typ, cnt, val = struct.unpack("<HHII", data[off:off + 12])
        tags[tag] = (typ, cnt, val)
    assert 33550 in tags and 33922 in tags and 34735 in tags
    scale = struct.unpack("<3d", data[tags[33550][2]:tags[33550][2] + 24])
    assert 0 < scale[0] < 1e-4  # deg/px for a 0.5 m/px-ish raster
    tie = struct.unpack("<6d", data[tags[33922][2]:tags[33922][2] + 48])
    assert abs(tie[4] - 44.97) < 0.01  # ul latitude near the reference


def test_decimate_surface_passthrough_and_binning():
    from imageanalysis_tpu.render.build_map import decimate_surface

    rng = np.random.default_rng(0)
    pts = rng.uniform(0, 1000, (500, 2))
    val = rng.normal(0, 3, 500)
    p2, v2 = decimate_surface(pts, val, target=50_000)
    assert p2 is not pts or len(p2) == 500        # under target: unchanged
    assert np.allclose(p2, pts) and np.allclose(v2, val)

    pts = rng.uniform(0, 1000, (40_000, 2))
    val = 0.01 * pts[:, 0] + rng.normal(0, 0.1, 40_000)
    p2, v2 = decimate_surface(pts, val, target=2_000)
    assert len(p2) < 6_000
    # cell means preserve the terrain trend
    pred = 0.01 * p2[:, 0]
    assert np.abs(v2 - pred).mean() < 0.2
    # the interpolation domain does not shrink: raw hull verts are included
    import scipy.spatial
    hull_raw = scipy.spatial.ConvexHull(pts).volume
    hull_dec = scipy.spatial.ConvexHull(p2).volume
    assert hull_dec >= hull_raw * 0.999
