"""End-to-end pipeline test: synthetic mission → process → check recovery.

This is BASELINE config 2 ("20-image strip: full pairwise match graph +
clean/combine + triangulation + BA") in miniature, proving the on-disk data
contracts and the full stage flow.
"""

import json
import os
import pickle

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")


@pytest.fixture(scope="module")
def mission(tmp_path_factory):
    from imageanalysis_tpu.testing.synthetic import SyntheticMission
    from imageanalysis_tpu.io import camera_db

    proj_dir = str(tmp_path_factory.mktemp("mission"))
    m = SyntheticMission(proj_dir, n_images=6, img_size=(800, 600),
                         altitude=100.0, spacing=15.0, seed=11)
    m.generate()
    # put the synthetic camera in a DB dir the pipeline can find
    db_dir = str(tmp_path_factory.mktemp("cameras"))
    camera_db.save("Synthetic_TestCam_none", m.camera_config(), db_dir)
    return m, db_dir


@pytest.fixture(scope="module")
def processed(mission):
    from imageanalysis_tpu.apps import process

    m, db_dir = mission
    rc = process.main([m.project_dir, "--camera", "Synthetic_TestCam_none",
                       "--camera-db", db_dir, "--scale", "1.0",
                       "--ground", "0.0", "--batch-size", "4",
                       "--min-chain-len", "2", "--geotiff",
                       "--geotiff-res", "0.5"])
    assert rc == 0
    return m


def test_workspace_layout(processed):
    m = processed
    ia = os.path.join(m.project_dir, "ImageAnalysis")
    for sub in ("meta", "cache", "state"):
        assert os.path.isdir(os.path.join(ia, sub))
    assert os.path.isfile(os.path.join(ia, "config.json"))
    assert os.path.isfile(os.path.join(ia, "matches_grouped"))
    # per-image artifacts
    for i in range(m.n_images):
        base = f"IMG_{i:04d}"
        assert os.path.isfile(os.path.join(ia, "meta", base + ".json"))
        assert os.path.isfile(os.path.join(ia, "cache", base + ".feat"))
        assert os.path.isfile(os.path.join(ia, "cache", base + ".desc"))
    with open(os.path.join(ia, "config.json")) as f:
        cfg = json.load(f)
    assert cfg["camera"]["width_px"] == m.w
    assert "ned_reference" in cfg


def test_meta_schema(processed):
    m = processed
    ia = os.path.join(m.project_dir, "ImageAnalysis")
    with open(os.path.join(ia, "meta", "IMG_0000.json")) as f:
        meta = json.load(f)
    ap = meta["aircraft_pose"]
    for key in ("lat_deg", "lon_deg", "alt_m", "yaw_deg", "pitch_deg",
                "roll_deg", "quat"):
        assert key in ap
    cp = meta["camera_pose"]
    assert len(cp["ned"]) == 3 and len(cp["quat"]) == 4
    assert meta["camera_pose_opt"]["valid"] is True


def test_match_structure(processed):
    m = processed
    ia = os.path.join(m.project_dir, "ImageAnalysis")
    with open(os.path.join(ia, "matches_grouped"), "rb") as f:
        matches = pickle.load(f)
    assert len(matches) > 100
    for match in matches[:50]:
        assert match[0] is not None and len(match[0]) == 3
        assert isinstance(match[1], int)
        assert len(match) >= 4  # ned, group, ≥2 obs
        for img, uv in match[2:]:
            assert 0 <= img < m.n_images
            assert len(uv) == 2
    # chains sorted longest first
    lens = [len(mm) for mm in matches]
    assert lens == sorted(lens, reverse=True)


def test_camera_recovery(processed):
    """Optimized camera positions should stay near the (GPS-exact) truth and
    reprojection should be sub-pixel."""
    from imageanalysis_tpu.io.project import ProjectMgr

    m = processed
    proj = ProjectMgr(m.project_dir)
    proj.load_images_info()
    truth = m.true_camera_ned(ref_lla=proj.ned_reference_lla())
    for i, im in enumerate(proj.image_list):
        assert im.has_opt_pose()
        ned, _, _ = im.get_camera_pose(opt=True)
        assert np.linalg.norm(np.asarray(ned) - truth[i]) < 3.0


def test_triangulated_points_on_ground(processed):
    m = processed
    ia = os.path.join(m.project_dir, "ImageAnalysis")
    with open(os.path.join(ia, "matches_grouped"), "rb") as f:
        matches = pickle.load(f)
    ned = np.array([mm[0] for mm in matches])
    # ground plane is at down≈0 in the synthetic world
    assert abs(np.median(ned[:, 2])) < 3.0


def test_step5_render_outputs(processed):
    m = processed
    models = os.path.join(m.project_dir, "ImageAnalysis", "models")
    assert os.path.isfile(os.path.join(models, "surface.bin"))
    assert os.path.isfile(os.path.join(models, "dummy.jpg"))
    eggs = [f for f in os.listdir(models) if f.endswith(".egg")]
    texs = [f for f in os.listdir(models) if f.endswith(".JPG")]
    assert len(eggs) >= m.n_images - 1
    assert len(texs) == m.n_images
    with open(os.path.join(models, "surface.bin"), "rb") as f:
        surf = pickle.load(f)
    assert set(surf) == {"points", "values"}
    assert len(surf["points"]) == len(surf["values"]) > 100
    # egg sanity: vertex pool + polygons present
    with open(os.path.join(models, eggs[0])) as f:
        egg = f.read()
    assert "<VertexPool> surface" in egg and "<Polygon>" in egg


def test_geotiff_output(processed):
    from PIL import Image

    m = processed
    models = os.path.join(m.project_dir, "ImageAnalysis", "models")
    tif = os.path.join(models, "mosaic.tif")
    assert os.path.isfile(tif)
    with Image.open(tif) as im:
        w, h = im.size
        arr = np.asarray(im)
    assert w > 100 and h > 100
    assert arr.std() > 10  # actual imagery, not blank
    assert os.path.isfile(os.path.join(models, "gdalscript.sh"))
    assert os.path.isfile(os.path.join(models, "surface-global.ac"))
    assert os.path.isfile(os.path.join(models, "direct.ac"))


def test_smart_json(processed):
    m = processed
    ia = os.path.join(m.project_dir, "ImageAnalysis")
    with open(os.path.join(ia, "smart.json")) as f:
        smart = json.load(f)
    rec = smart["IMG_0000"]
    assert "srtm_surface_m" in rec
    assert "tri_surface_pairs" in rec
    # flat synthetic ground at 0 elevation; triangulated estimate near 0
    assert abs(rec["tri_surface_m"]) < 5.0


def test_pipeline_resume_is_noop(processed, capsys):
    """Re-running process must skip all completed stages via state gating."""
    from imageanalysis_tpu.apps import process

    m = processed
    rc = process.main([m.project_dir, "--ground", "0.0"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "Step 3a" not in out
    assert "Pipeline complete" in out


def test_explorer_headless_render(processed, tmp_path):
    """The explorer renders the Step-5 models into a mosaic view."""
    from imageanalysis_tpu.apps.explorer import Explorer

    m = processed
    ex = Explorer(m.project_dir)
    out = str(tmp_path / "mosaic_view.png")
    drawn = ex.render_to(out)
    assert drawn >= m.n_images - 1
    assert os.path.getsize(out) > 20000
    # elevation queries against surface.bin work (flat ground near 0)
    assert abs(ex.get_elevation(0.0, 0.0)) < 3.0
    # annotation round trip through the explorer
    ex.annotations.add_marker_ned([5.0, 5.0, 0.0], "test marker")
    ex.annotations.save()
    ia = os.path.join(m.project_dir, "ImageAnalysis")
    assert os.path.isfile(os.path.join(ia, "annotations.json"))


def test_store_path_matches_host_path(processed):
    """The resident-descriptor-store matcher must reproduce the host-assembly
    matcher's pairs (uint8 quantization of integral SIFT values is exact)."""
    from imageanalysis_tpu.io.project import ProjectMgr
    from imageanalysis_tpu.match.matcher import BatchMatcher, MatchConfig

    m = processed
    proj = ProjectMgr(m.project_dir)
    proj.load_images_info()
    for im in proj.image_list:
        im.load_features()
        im.load_descriptors()
    pairs = [(0, 1), (1, 2), (2, 3)]
    cfg = MatchConfig(batch_size=4, bf16=True)

    host = BatchMatcher(proj, cfg, use_store=False)
    host.match_pairs(pairs, progress=False)
    host_results = {(i, j): list(proj.image_list[i].match_list[
        proj.image_list[j].name]) for i, j in pairs}

    # once with the default full-download unpack, once with device-side
    # compaction (the slow-link option) — both must reproduce the host path
    for compact in (False, True):
        for im in proj.image_list:
            im.match_list = {}
        cfg_s = MatchConfig(batch_size=4, bf16=True,
                            compact_downloads=compact)
        store = BatchMatcher(proj, cfg_s, use_store=True)
        assert store.store is not None
        store.match_pairs(pairs, progress=False)
        for i, j in pairs:
            got = proj.image_list[i].match_list[proj.image_list[j].name]
            want = host_results[(i, j)]
            # identical knn + identical PRNG keys → near-identical match
            # sets (uint8 vs f32 rounding can flip a handful of marginal
            # RANSAC calls)
            inter = len({tuple(p) for p in got} & {tuple(p) for p in want})
            assert inter > 0.9 * max(len(want), 1), \
                (compact, i, j, len(got), len(want))


def test_orb_detector_pipeline(tmp_path):
    """The ORB path (binary descriptors → unpacked-bit Hamming) matches and
    reconstructs the mission too."""
    from imageanalysis_tpu.apps import process
    from imageanalysis_tpu.io import camera_db
    from imageanalysis_tpu.io.project import ProjectMgr
    from imageanalysis_tpu.testing.synthetic import SyntheticMission

    proj_dir = str(tmp_path / "orb")
    m = SyntheticMission(proj_dir, n_images=4, img_size=(640, 480),
                         altitude=90.0, spacing=10.0, seed=13)
    m.generate()
    db = str(tmp_path / "cams")
    camera_db.save("Synthetic_TestCam_none", m.camera_config(), db)
    rc = process.main([proj_dir, "--camera", "Synthetic_TestCam_none",
                       "--camera-db", db, "--detector", "ORB",
                       "--max-features", "2000", "--scale", "1.0",
                       "--ground", "0.0", "--batch-size", "2",
                       "--min-chain-len", "2"])
    assert rc == 0
    proj = ProjectMgr(proj_dir)
    proj.load_images_info()
    truth = m.true_camera_ned(ref_lla=proj.ned_reference_lla())
    for i, im in enumerate(proj.image_list):
        ned, _, _ = im.get_camera_pose(opt=True)
        assert np.linalg.norm(np.asarray(ned) - truth[i]) < 3.0


def test_explorer_texture_pipeline(processed, tmp_path):
    """Full-res texture paging + LRU + histogram matching + filters +
    reticle (reference explorer.py:229-307, 386-689; explore/reticle.py;
    explore/myshader.frag)."""
    from imageanalysis_tpu.apps.explorer import Explorer
    from imageanalysis_tpu.io.project import ProjectMgr
    from imageanalysis_tpu.render import texture as tex_mod
    from imageanalysis_tpu.render import histogram as hist_mod

    m = processed
    proj = ProjectMgr(m.project_dir)
    proj.load_images_info()

    # build histogram-matching tables, then reload through the manager
    tex_mod.build_histograms(proj)
    assert os.path.isfile(os.path.join(proj.analysis_dir,
                                       "histogram.pickle"))
    tm = tex_mod.TextureManager(proj)
    assert tm.templates is not None and len(tm.templates) == m.n_images

    # base texture: corrected 512²
    name = proj.image_list[0].name
    base = tm.load_base(name)
    assert base is not None and base.shape == (512, 512, 3)

    # full-res paging + LRU semantics
    full = tm.load_full(name)
    assert full is not None
    assert full.shape[0] > 512 or full.shape[1] > 512
    for i in range(m.n_images):
        tm.load_full(proj.image_list[i].name)
    assert len(tm.tcache) <= tm.CACHE_SIZE
    # re-request refreshes the timestamp (LRU hit, no reload)
    t0 = tm.tcache[proj.image_list[1].name][1]
    tm.load_full(proj.image_list[1].name)
    assert tm.tcache[proj.image_list[1].name][1] >= t0

    # histogram matching actually changes pixel statistics toward template
    img = tm.load_full(name)
    assert img.dtype == np.uint8 and np.isfinite(img).all()

    # every shader filter produces a valid image
    for mode in tex_mod.FILTERS:
        out = tex_mod.apply_filter(base, mode)
        assert out.shape == base.shape and out.dtype == np.uint8

    # explorer renders with full-res top image + reticle
    ex = Explorer(m.project_dir)
    out = str(tmp_path / "mosaic_fullres.png")
    drawn = ex.render_to(out, full_res_top=True, reticle=True)
    assert drawn >= m.n_images - 1
    assert os.path.getsize(out) > 20000
    # a full-res texture got paged into the LRU by the render
    assert len(ex.textures.tcache) >= 1
    # top-image selection returns a model under the view center
    names = ex._model_names()
    top = ex.select_top(names, (0.0, 0.0))
    assert top in names


def test_world_texture_consistency():
    """Procedural world tiles: deterministic, and overlapping patches see
    identical ground (required so overlapping synthetic views match)."""
    from imageanalysis_tpu.testing.synthetic import WorldTexture

    w1 = WorldTexture(seed=123, res=0.5, tile_m=64.0)
    w2 = WorldTexture(seed=123, res=0.5, tile_m=64.0)
    t1, S1 = w1.patch(-10, -10, 100, 100)
    t2, S2 = w2.patch(-10, -10, 100, 100)
    np.testing.assert_array_equal(t1, t2)
    # shifted patch: the overlapping world region has identical pixels
    t3, S3 = w1.patch(30, 30, 160, 160)
    # world point (64, 64) in both patches
    def px_of(S, n, e):
        py = (n - S[0, 2]) / S[0, 1]
        px = (e - S[1, 2]) / S[1, 0]
        return int(round(py)), int(round(px))
    y1, x1 = px_of(S1, 64.0, 64.0)
    y3, x3 = px_of(S3, 64.0, 64.0)
    a = t1[y1:y1 + 50, x1:x1 + 50]
    b = t3[y3:y3 + 50, x3:x3 + 50]
    np.testing.assert_array_equal(a, b)
    # different seed differs
    w4 = WorldTexture(seed=124, res=0.5, tile_m=64.0)
    t4, _ = w4.patch(-10, -10, 100, 100)
    assert (t4 != t1).mean() > 0.5


def test_world_tiles_mission_end_to_end(tmp_path):
    """A world-tiled synthetic mission processes end to end (this is the
    generator mode that makes 1000+ image missions possible)."""
    from imageanalysis_tpu.apps import process
    from imageanalysis_tpu.io import camera_db
    from imageanalysis_tpu.io.project import ProjectMgr
    from imageanalysis_tpu.testing.synthetic import SyntheticMission

    proj_dir = str(tmp_path / "m")
    m = SyntheticMission(proj_dir, n_images=4, img_size=(640, 480),
                         altitude=90.0, spacing=12.0, seed=3,
                         texture_res=0.15, world_tiles=True)
    m.generate()
    db = str(tmp_path / "cams")
    camera_db.save("Synthetic_TestCam_none", m.camera_config(), db)
    rc = process.main([proj_dir, "--camera", "Synthetic_TestCam_none",
                       "--camera-db", db, "--scale", "1.0", "--ground", "0.0",
                       "--batch-size", "2", "--min-chain-len", "2"])
    assert rc == 0
    proj = ProjectMgr(proj_dir)
    proj.load_images_info()
    ref = proj.ned_reference_lla()
    true_ned = m.true_camera_ned(ref)
    errs = [np.linalg.norm(
        np.array(im.get_camera_pose(opt=im.has_opt_pose())[0]) - true_ned[i])
        for i, im in enumerate(proj.image_list)]
    assert np.mean(errs) < 0.3, errs
