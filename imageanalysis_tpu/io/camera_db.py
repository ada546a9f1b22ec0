"""Camera calibration database: ``cameras/<Make_Model_Lens>.json``.

Same JSON contract as the reference (reference camera.py:16-139; 35 configs
in its cameras/ dir): row-major K (9 floats), 5 distortion coefficients
[k1,k2,p1,p2,k3], ccd dims (mm), focal length (mm), image size (px), optional
mount ypr. Also provides the EXIF→config estimator the reference ships as
scripts/99-new-camera.py:1-122 (K from focal length + ccd size) so unknown
cameras get a usable starting calibration.
"""

from __future__ import annotations

import json
import os

import numpy as np

from ..core.camera import CameraModel

# built-in DB directory (inside a project: <analysis_dir>/../cameras or the
# package's own cameras/)
PACKAGE_DB = os.path.join(os.path.dirname(os.path.dirname(__file__)), "cameras")


def config_from_dict(d: dict) -> dict:
    """Normalize a camera-config dict (fill defaults)."""
    cfg = {
        "make": d.get("make", "unknown"),
        "model": d.get("model", "unknown"),
        "lens_model": d.get("lens_model", "unknown"),
        "focal_len_mm": float(d.get("focal_len_mm", 0.0)),
        "ccd_width_mm": float(d.get("ccd_width_mm", 0.0)),
        "ccd_height_mm": float(d.get("ccd_height_mm", 0.0)),
        "K": [float(x) for x in d.get("K", [0.0] * 9)],
        "dist_coeffs": [float(x) for x in d.get("dist_coeffs", [0.0] * 5)],
        "width_px": int(d.get("width_px", 0)),
        "height_px": int(d.get("height_px", 0)),
        "mount": {
            "yaw_deg": float(d.get("mount", {}).get("yaw_deg", 0.0)),
            "pitch_deg": float(d.get("mount", {}).get("pitch_deg", 0.0)),
            "roll_deg": float(d.get("mount", {}).get("roll_deg", 0.0)),
        },
    }
    for opt in ("K_opt", "dist_coeffs_opt"):
        if opt in d:
            cfg[opt] = [float(x) for x in d[opt]]
    return cfg


def load(camera_key: str, db_dirs=None) -> dict | None:
    """Look up cameras/<camera_key>.json in the given DB dirs."""
    dirs = list(db_dirs or []) + [PACKAGE_DB]
    for dd in dirs:
        path = os.path.join(dd, camera_key + ".json")
        if os.path.isfile(path):
            with open(path) as f:
                return config_from_dict(json.load(f))
    return None


def save(camera_key: str, cfg: dict, db_dir: str):
    os.makedirs(db_dir, exist_ok=True)
    with open(os.path.join(db_dir, camera_key + ".json"), "w") as f:
        json.dump(cfg, f, indent=4, sort_keys=True)


def estimate_from_exif(image_file: str, ccd_width_mm: float | None = None) -> dict:
    """Build a starting camera config from EXIF (reference 99-new-camera.py):
    fx = focal_mm · width_px / ccd_width_mm, principal point at center,
    zero distortion."""
    from PIL import Image as PILImage
    from PIL.ExifTags import Base as ExifBase, IFD

    from . import exif as exif_mod

    with PILImage.open(image_file) as im:
        width_px, height_px = im.size
        ex = im.getexif()
        try:
            exif_ifd = ex.get_ifd(IFD.Exif)
        except KeyError:
            exif_ifd = {}
        focal = exif_ifd.get(ExifBase.FocalLength, 0.0)
        try:
            focal_mm = float(focal)
        except TypeError:
            focal_mm = float(focal[0]) / float(focal[1])
    _, make, model, lens = exif_mod.get_camera_info(image_file)
    if ccd_width_mm is None:
        ccd_width_mm = 6.17  # common 1/2.3" sensor default
    ccd_height_mm = ccd_width_mm * height_px / max(width_px, 1)
    fx = focal_mm * width_px / ccd_width_mm if ccd_width_mm > 0 else 0.0
    return config_from_dict({
        "make": make, "model": model, "lens_model": lens or "unknown",
        "focal_len_mm": focal_mm,
        "ccd_width_mm": ccd_width_mm, "ccd_height_mm": ccd_height_mm,
        "K": [fx, 0.0, width_px / 2.0, 0.0, fx, height_px / 2.0, 0.0, 0.0, 1.0],
        "width_px": width_px, "height_px": height_px,
    })


def to_model(cfg: dict, optimized=False) -> CameraModel:
    """Camera-config dict → jnp CameraModel (K_opt/dist_coeffs_opt when
    optimized=True and present, matching reference camera.py:58-113)."""
    import jax.numpy as jnp

    K = cfg.get("K_opt") if optimized and cfg.get("K_opt") else cfg["K"]
    d = (cfg.get("dist_coeffs_opt") if optimized and cfg.get("dist_coeffs_opt")
         else cfg["dist_coeffs"])
    return CameraModel(
        K=jnp.asarray(np.array(K, np.float32).reshape(3, 3)),
        dist=jnp.asarray(np.array(d, np.float32)),
        width=int(cfg.get("width_px", 0)),
        height=int(cfg.get("height_px", 0)),
    )
