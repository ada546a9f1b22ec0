"""SRTM: downloader, .hgt parse, NED interpolation, ray intersection.

Covers the reference's tile acquisition path (srtm.py:66-99 download →
parse) using a file:// mirror of a synthetic-terrain tile, the area
interpolator accuracy against the analytic terrain, iterative ray
intersection, graceful offline fallback, and an end-to-end mission run
WITHOUT --ground (SRTM terrain drives triangulation initialization).
"""

import os
import zipfile

import numpy as np
import pytest


LAT_I, LON_I = 44, -94            # tile N44W094 (synthetic mission area)
REF_LLA = [44.971, -93.261, 0.0]


def _elev(lat, lon):
    """Analytic synthetic terrain (m)."""
    return (250.0 + 60.0 * np.sin(lat * 40.0) * np.cos(lon * 35.0)
            + 25.0 * np.sin(lon * 90.0))


def _make_tile(dim=1201):
    r = np.arange(dim)
    lat = LAT_I + 1 - r / (dim - 1)          # row 0 = north edge
    lon = LON_I + np.arange(dim) / (dim - 1)
    z = _elev(lat[:, None], lon[None, :])
    return np.round(z).astype(">i2")


@pytest.fixture(scope="module")
def mirror(tmp_path_factory):
    """file:// SRTM mirror + cache dir, env wired up."""
    root = tmp_path_factory.mktemp("dem3")
    sub = root / "N44"
    sub.mkdir()
    tile = _make_tile()
    with zipfile.ZipFile(sub / "N44W094.hgt.zip", "w") as z:
        z.writestr("N44W094.hgt", tile.tobytes())
    cache = tmp_path_factory.mktemp("srtm_cache")
    return str(root), str(cache)


def test_download_parse_interp_intersect(mirror, monkeypatch):
    from imageanalysis_tpu.surface import srtm

    root, cache = mirror
    monkeypatch.setenv("SRTM_URL", "file://" + root)
    monkeypatch.setenv("SRTM_CACHE", cache)

    # download through the file:// mirror into the cache
    path = srtm.download_tile("N44W094")
    assert path is not None and os.path.isfile(path)
    assert path.startswith(cache)

    tile = srtm.load_tile("N44W094")
    assert tile is not None and tile.shape == (1201, 1201)

    # interpolator vs analytic terrain at the NED reference
    terr = srtm.Terrain(REF_LLA, width_m=3000, height_m=3000, step_m=30)
    assert not terr.flat
    got = float(terr.interp(0.0, 0.0))
    want = _elev(REF_LLA[0], REF_LLA[1])
    # tile is integer-quantized (±0.5 m) + bilinear over ~90 m cells of a
    # smooth field
    assert abs(got - want) < 3.0, (got, want)

    # a second probe away from the center
    import jax.numpy as jnp
    from imageanalysis_tpu.core import geodesy
    n, e = 800.0, -600.0
    lla = geodesy.ned2lla(np.array([[n, e, 0.0]]), *REF_LLA)[0]
    got2 = float(terr.interp(n, e))
    want2 = _elev(lla[0], lla[1])
    assert abs(got2 - want2) < 3.0, (got2, want2)

    # nadir ray from 500 m above the reference hits the surface
    cam = jnp.asarray([0.0, 0.0, -500.0])
    vecs = jnp.asarray([[0.0, 0.0, 1.0], [0.1, 0.05, 0.99]])
    pts = np.asarray(terr.intersect_vectors(cam, vecs))
    assert abs(-pts[0, 2] - want) < 3.0      # up elevation at the surface
    # oblique ray also lands on the surface (self-consistency)
    land = float(terr.interp(pts[1, 0], pts[1, 1]))
    assert abs(-pts[1, 2] - land) < 2.0


def test_offline_graceful_fallback(monkeypatch, tmp_path):
    from imageanalysis_tpu.surface import srtm

    monkeypatch.setenv("SRTM_URL", "file:///nonexistent_mirror")
    monkeypatch.setenv("SRTM_CACHE", str(tmp_path / "empty"))
    monkeypatch.setenv("SRTM_DOWNLOAD", "1")
    assert srtm.download_tile("N44W094") is None
    terr = srtm.Terrain(REF_LLA, width_m=1000, height_m=1000, step_m=50,
                        fallback_elev=123.0)
    assert terr.flat
    assert float(terr.interp(0.0, 0.0)) == pytest.approx(123.0)


def test_e2e_mission_with_srtm_terrain(mirror, monkeypatch, tmp_path):
    """Pipeline without --ground: terrain comes from the SRTM cache.

    The synthetic mission renders a flat scene, so the tile here is a
    near-zero-elevation variant — the point is the srtm code path end to
    end (reference process.py:218 srtm.initialize + 3c srtm method)."""
    from imageanalysis_tpu.apps import process
    from imageanalysis_tpu.io import camera_db
    from imageanalysis_tpu.testing.synthetic import SyntheticMission

    cache = tmp_path / "cache"
    cache.mkdir()
    dim = 1201
    flat = np.zeros((dim, dim), ">i2")
    with zipfile.ZipFile(cache / "N44W094.hgt.zip", "w") as z:
        z.writestr("N44W094.hgt", flat.tobytes())
    monkeypatch.setenv("SRTM_CACHE", str(cache))
    monkeypatch.delenv("SRTM_DOWNLOAD", raising=False)

    proj_dir = str(tmp_path / "m")
    m = SyntheticMission(proj_dir, n_images=3, img_size=(640, 480),
                         altitude=90.0, spacing=12.0, seed=5)
    m.generate()
    db = str(tmp_path / "cams")
    camera_db.save("Synthetic_TestCam_none", m.camera_config(), db)
    rc = process.main([proj_dir, "--camera", "Synthetic_TestCam_none",
                       "--camera-db", db, "--scale", "1.0",
                       "--batch-size", "2", "--min-chain-len", "2"])
    assert rc == 0
    assert os.path.isfile(os.path.join(proj_dir, "ImageAnalysis",
                                       "matches_grouped"))
