"""Top-down orthomosaic compositing + GeoTIFF export.

Reference render4geotiff.py:33-319: warp each image into a meters-per-pixel
raster via the ground-plane homography from its (optimized) pose, blend with
feathered masks, then shell out to gdal for GeoTIFF/web tiles.

Here:
- the per-image ground homography comes from the same camera math as the
  pipeline (K [r1 r2 t] column construction for the z=ground plane);
- compositing uses distance-feathered alpha accumulation;
- the GeoTIFF is written natively (``write_geotiff`` — gdal is not present
  in this environment): uncompressed striped RGB TIFF with the
  ModelPixelScale/ModelTiepoint GeoKeys for EPSG:4326;
- a ``gdalscript.sh`` with the reference's gdal_translate/gdal2tiles
  commands is still emitted for users who post-process elsewhere.
"""

from __future__ import annotations

import os
import struct

import numpy as np

from ..core import geodesy
from ..io.logger import log


def ground_homography(K, body2ned, cam_ned, ground_down):
    """Homography mapping NED ground-plane (n, e) → image pixels for a
    camera at cam_ned: uv ~ K [R_col_n, R_col_e, R·(p0 − c)] with
    p0 = (0, 0, ground_down)."""
    from ..core.camera import BODY2CAM

    R = np.asarray(BODY2CAM) @ np.asarray(body2ned).T
    t = R @ (np.array([0.0, 0.0, ground_down]) - np.asarray(cam_ned))
    H = np.asarray(K) @ np.column_stack([R[:, 0], R[:, 1], t])
    return H


def composite(proj, group_images=None, resolution=0.25, ground=None,
              feather=50):
    """Composite the mission into one top-down raster.

    resolution: meters/pixel. Returns (mosaic_bgr uint8, extent
    (n_min, e_min, n_max, e_max)).
    """
    import cv2

    from ..core.rotations import quat_to_matrix

    images = [im for im in (proj.image_list if group_images is None else
                            [proj.image_by_name(n) for n in group_images])
              if im is not None]
    model = proj.camera_model(optimized=True)
    K = np.asarray(model.K)
    w_px = int(proj.camera.get("width_px", 0))
    h_px = int(proj.camera.get("height_px", 0))

    if ground is None:
        ground = 0.0

    # mission extent: project image corners to the ground plane
    corners = np.array([[0, 0], [w_px, 0], [w_px, h_px], [0, h_px]], float)
    footprints = []
    for im in images:
        use_opt = im.has_opt_pose()
        ned, _, quat = im.get_camera_pose(opt=use_opt)
        B = np.asarray(quat_to_matrix(np.asarray(quat, np.float64)))
        H = ground_homography(K, B, ned, -ground)
        Hi = np.linalg.inv(H)
        ch = np.c_[corners, np.ones(4)] @ Hi.T
        footprints.append(ch[:, :2] / ch[:, 2:3])
    fp = np.concatenate(footprints)
    n_min, e_min = fp.min(axis=0) - 2
    n_max, e_max = fp.max(axis=0) + 2
    W = int((e_max - e_min) / resolution)
    Hh = int((n_max - n_min) / resolution)
    if W * Hh > 120_000_000:
        raise ValueError(f"mosaic {W}x{Hh} too large; raise resolution")
    log(f"Orthomosaic {W}x{Hh} px at {resolution} m/px")

    acc = np.zeros((Hh, W, 3), np.float32)
    wacc = np.zeros((Hh, W), np.float32)
    # raster (row, col) → NED: n = n_max − row·res (north up), e = e_min + col·res
    S = np.array([[0.0, -resolution, n_max],
                  [resolution, 0.0, e_min],
                  [0.0, 0.0, 1.0]])  # maps (col,row,1) → (n,e,1)

    for im, foot in zip(images, footprints):
        use_opt = im.has_opt_pose()
        ned, _, quat = im.get_camera_pose(opt=use_opt)
        B = np.asarray(quat_to_matrix(np.asarray(quat, np.float64)))
        Hm = ground_homography(K, B, ned, -ground) @ _swap_rc(S)
        img = cv2.imread(proj.image_path(im),
                         flags=cv2.IMREAD_ANYCOLOR | cv2.IMREAD_IGNORE_ORIENTATION)
        if img.ndim == 2:
            img = cv2.cvtColor(img, cv2.COLOR_GRAY2BGR)
        warped = cv2.warpPerspective(img, np.linalg.inv(Hm), (W, Hh),
                                     flags=cv2.INTER_LINEAR)
        mask = cv2.warpPerspective(np.ones((h_px, w_px), np.float32),
                                   np.linalg.inv(Hm), (W, Hh))
        if feather > 0:
            mask = cv2.erode(mask, np.ones((3, 3)), iterations=1)
            mask = cv2.blur(mask, (feather, feather))
        acc += warped.astype(np.float32) * mask[..., None]
        wacc += mask
    mosaic = (acc / np.maximum(wacc[..., None], 1e-6)).clip(0, 255).astype(np.uint8)
    mosaic[wacc < 1e-6] = 0
    return mosaic, (float(n_min), float(e_min), float(n_max), float(e_max))


def _swap_rc(S):
    """S maps (col,row,1)→(n,e,1); warpPerspective composes with (x=col,y=row)."""
    return S


# ---------------------------------------------------------------------------
# native GeoTIFF writer
# ---------------------------------------------------------------------------

_T_SHORT, _T_LONG, _T_RATIONAL, _T_DOUBLE, _T_ASCII = 3, 4, 5, 12, 2


def write_geotiff(path, mosaic_bgr, extent_ned, ned_ref):
    """Write an EPSG:4326 GeoTIFF (uncompressed, single strip set).

    mosaic_bgr: (H, W, 3) uint8 north-up raster; extent_ned =
    (n_min, e_min, n_max, e_max) in project NED meters; ned_ref = reference
    lla. Pixel scale/tiepoint GeoKeys per the GeoTIFF 1.1 spec.
    """
    H, W = mosaic_bgr.shape[:2]
    n_min, e_min, n_max, e_max = extent_ned
    # corner lla (north-up: row 0 = n_max)
    ul = geodesy.ned2lla([n_max, e_min, 0.0], *ned_ref)
    lr = geodesy.ned2lla([n_min, e_max, 0.0], *ned_ref)
    lon0, lat0 = ul[1], ul[0]
    dlon = (lr[1] - ul[1]) / W
    dlat = (ul[0] - lr[0]) / H

    rgb = mosaic_bgr[..., ::-1].tobytes()  # BGR→RGB

    # GeoKeyDirectory: version, rev, minor, count, then keys:
    # GTModelType=2 (geographic), GTRasterType=1 (pixel-is-area),
    # GeographicType=4326
    geokeys = [1, 1, 0, 3,
               1024, 0, 1, 2,
               1025, 0, 1, 1,
               2048, 0, 1, 4326]
    pixel_scale = [dlon, dlat, 0.0]
    tiepoint = [0.0, 0.0, 0.0, lon0, lat0, 0.0]

    entries = []  # (tag, type, count, value_or_bytes)
    entries.append((256, _T_LONG, 1, W))             # ImageWidth
    entries.append((257, _T_LONG, 1, H))             # ImageLength
    entries.append((258, _T_SHORT, 3, struct.pack("<3H", 8, 8, 8)))
    entries.append((259, _T_SHORT, 1, 1))            # no compression
    entries.append((262, _T_SHORT, 1, 2))            # RGB
    entries.append((277, _T_SHORT, 1, 3))            # samples/pixel
    entries.append((278, _T_LONG, 1, H))             # rows/strip (single)
    entries.append((279, _T_LONG, 1, len(rgb)))      # strip byte count
    entries.append((284, _T_SHORT, 1, 1))            # chunky
    entries.append((33550, _T_DOUBLE, 3, struct.pack("<3d", *pixel_scale)))
    entries.append((33922, _T_DOUBLE, 6, struct.pack("<6d", *tiepoint)))
    entries.append((34735, _T_SHORT, len(geokeys),
                    struct.pack("<%dH" % len(geokeys), *geokeys)))

    n_dir = len(entries) + 1  # + StripOffsets
    header_size = 8
    ifd_size = 2 + 12 * n_dir + 4
    # external data area after IFD
    ext = b""
    ext_offsets = {}
    data_start = header_size + ifd_size
    for i, (tag, typ, cnt, val) in enumerate(entries):
        if isinstance(val, bytes) and len(val) > 4:
            ext_offsets[i] = data_start + len(ext)
            ext += val + (b"\x00" if len(val) % 2 else b"")
    strip_offset = data_start + len(ext)

    def pack_entry(tag, typ, cnt, val, idx):
        if isinstance(val, bytes):
            if len(val) <= 4:
                return struct.pack("<HHI4s", tag, typ, cnt, val.ljust(4, b"\x00"))
            return struct.pack("<HHII", tag, typ, cnt, ext_offsets[idx])
        return struct.pack("<HHII", tag, typ, cnt, int(val))

    with open(path, "wb") as f:
        f.write(struct.pack("<2sHI", b"II", 42, header_size))
        f.write(struct.pack("<H", n_dir))
        all_entries = entries + [(273, _T_LONG, 1, strip_offset)]
        all_entries.sort(key=lambda e: e[0])
        idx_of = {id(e): i for i, e in enumerate(entries)}
        for e in all_entries:
            f.write(pack_entry(e[0], e[1], e[2], e[3], idx_of.get(id(e), -1)))
        f.write(struct.pack("<I", 0))  # next IFD
        f.write(ext)
        f.write(rgb)
    log("Wrote GeoTIFF:", path,
        f"({W}x{H}, ul={lat0:.6f},{lon0:.6f}, {dlat:.2e}°/px)")


def write_gdal_script(analysis_dir, tif_name="mosaic.tif"):
    """Emit the reference's post-processing script (render4geotiff.py:276-319
    intent): warp to tiles for web maps."""
    script = os.path.join(analysis_dir, "models", "gdalscript.sh")
    os.makedirs(os.path.dirname(script), exist_ok=True)
    with open(script, "w") as f:
        f.write("#!/bin/sh\n"
                "# post-process the orthomosaic with gdal (run where gdal "
                "is installed)\n"
                f"gdal_translate -of GTiff -co COMPRESS=JPEG {tif_name} "
                "mosaic_compressed.tif\n"
                f"gdal2tiles.py -z 16-22 {tif_name} tiles\n")
    os.chmod(script, 0o755)
    return script


def build_geotiff(proj, group_images=None, resolution=0.25, ground=0.0):
    """End-to-end: composite + write models/mosaic.tif + gdalscript.sh."""
    mosaic, extent = composite(proj, group_images, resolution=resolution,
                               ground=ground)
    os.makedirs(proj.models_dir, exist_ok=True)
    out = os.path.join(proj.models_dir, "mosaic.tif")
    write_geotiff(out, mosaic, extent, proj.ned_reference_lla())
    write_gdal_script(proj.analysis_dir)
    return out
