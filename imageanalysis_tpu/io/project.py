"""Project workspace: the reference-compatible on-disk contract.

Layout (reference project.py:24-82, SURVEY.md §1 data contracts):

    <project_dir>/                      the mission's image folder
      IMG_0001.jpg ...
      pix4d.csv | image-metadata.txt    pose input
      ImageAnalysis/
        config.json                     serialized /config tree
        messages-<host>                 run log
        meta/<image>.json               per-image pose metadata
        meta/<image>.match              pickle {other_name: [[i,j],...]}
        cache/<image>.feat              gzip pickle [(pt,size,angle,response,
                                        octave,class_id), ...]
        cache/<image>.desc              gzip np.save descriptor matrix
        state/STEPn                     stage gate markers
        matches_grouped                 pickle unified match list
        groups.json                     list of image-name lists
        smart.json                      /smart priors tree
        models/                         render outputs

All host-side Python — this is the compatibility shell; compute lives on the
device.
"""

from __future__ import annotations

import fnmatch
import gzip
import os
import pickle

import numpy as np

from . import camera_db, logger, state
from .props import PropertyNode
from ..core import geodesy
from ..core.rotations import quat_from_ypr, quat_multiply, quat_to_matrix, ypr_from_quat

D2R = np.pi / 180.0
R2D = 180.0 / np.pi


class ImageRecord:
    """Per-image state: poses, features, matches (reference image.py:25)."""

    def __init__(self, analysis_dir: str, base: str):
        self.name = base
        self.analysis_dir = analysis_dir
        self.meta_file = os.path.join(analysis_dir, "meta", base + ".json")
        self.match_file = os.path.join(analysis_dir, "meta", base + ".match")
        self.features_file = os.path.join(analysis_dir, "cache", base + ".feat")
        self.desc_file = os.path.join(analysis_dir, "cache", base + ".desc")
        self.node = PropertyNode()
        self.kp = None          # (n, 2) float32 keypoint uv
        self.kp_meta = None     # (n, 4) size, angle, response, octave
        self.des = None         # (n, d) descriptors
        self.uv_list = None     # undistorted kp uv
        self.match_list = {}
        self.matches_clean = True
        if os.path.isfile(self.meta_file):
            self.node = PropertyNode.load_json(self.meta_file)

    # -- poses ------------------------------------------------------------
    def set_aircraft_pose(self, lat_deg, lon_deg, alt_m, yaw_deg, pitch_deg,
                          roll_deg, flight_time=-1.0):
        quat = np.asarray(quat_from_ypr(yaw_deg * D2R, pitch_deg * D2R, roll_deg * D2R))
        n = self.node.node("aircraft_pose")
        n.set("lat_deg", float(lat_deg))
        n.set("lon_deg", float(lon_deg))
        n.set("alt_m", float(alt_m))
        n.set("yaw_deg", float(yaw_deg))
        n.set("pitch_deg", float(pitch_deg))
        n.set("roll_deg", float(roll_deg))
        n.setlist("quat", quat)
        if flight_time > 0.0:
            self.node.set("flight_time", float(flight_time))

    def set_camera_pose(self, ned, yaw_deg, pitch_deg, roll_deg, opt=False,
                        quat=None):
        """Store a camera pose. Pass ``quat`` explicitly whenever you have
        one: reconstructing it from ypr is singular at pitch ±90° (gimbal
        lock) and silently corrupts near-nadir attitudes — the reference
        does exactly that round trip (image.py:462-481 via pose.py:147-152)
        and survives only because real gimbals are never at exactly −90°."""
        if quat is None:
            quat = np.asarray(quat_from_ypr(yaw_deg * D2R, pitch_deg * D2R,
                                            roll_deg * D2R))
        n = self.node.node("camera_pose_opt" if opt else "camera_pose")
        if opt:
            n.set("valid", True)
        n.setlist("ned", ned)
        n.set("yaw_deg", float(yaw_deg))
        n.set("pitch_deg", float(pitch_deg))
        n.set("roll_deg", float(roll_deg))
        n.setlist("quat", quat)

    def set_aircraft_yaw_error_estimate(self, yaw_error_deg, body2cam_quat):
        """Fold a smart yaw-error estimate into the aircraft AND camera pose
        quats (reference image.py:434-460): heading from ground-track or
        magnetometer often carries a bias; the pairwise affine-course
        estimate corrects it before triangulation/BA."""
        n = self.node.node("aircraft_pose")
        n.set("yaw_error_deg", float(yaw_error_deg))
        yaw = n.get("yaw_deg", 0.0) + yaw_error_deg
        ned2body = np.asarray(quat_from_ypr(yaw * D2R,
                                            n.get("pitch_deg", 0.0) * D2R,
                                            n.get("roll_deg", 0.0) * D2R))
        n.setlist("quat", ned2body)
        ned2cam = np.asarray(quat_multiply(ned2body, body2cam_quat))
        y, p, r = (float(v) * R2D for v in ypr_from_quat(ned2cam))
        ned, _, _ = self.get_camera_pose()
        self.set_camera_pose(ned, y, p, r, quat=ned2cam)

    def get_aircraft_pose(self):
        n = self.node.node("aircraft_pose")
        lla = [n.get("lat_deg", 0.0), n.get("lon_deg", 0.0), n.get("alt_m", 0.0)]
        ypr = [n.get("yaw_deg", 0.0), n.get("pitch_deg", 0.0), n.get("roll_deg", 0.0)]
        return lla, ypr, n.getlist("quat")

    def get_camera_pose(self, opt=False):
        name = "camera_pose_opt" if opt else "camera_pose"
        n = self.node.node(name)
        ned = n.getlist("ned") or [0.0, 0.0, 0.0]
        ypr = [n.get("yaw_deg", 0.0), n.get("pitch_deg", 0.0), n.get("roll_deg", 0.0)]
        quat = n.getlist("quat") or [1.0, 0.0, 0.0, 0.0]
        return ned, ypr, quat

    def has_opt_pose(self):
        n = self.node.node("camera_pose_opt", create=False)
        return bool(n and n.get("valid"))

    def get_body2ned(self, opt=False):
        _, _, quat = self.get_camera_pose(opt)
        return np.asarray(quat_to_matrix(np.asarray(quat, np.float64)))

    def get_size(self):
        return int(self.node.get("width", 0)), int(self.node.get("height", 0))

    def set_size(self, width, height):
        self.node.set("width", int(width))
        self.node.set("height", int(height))

    # -- persistence ------------------------------------------------------
    def save_meta(self):
        self.node.save_json(self.meta_file)

    def save_features(self):
        """.feat cache. Two formats behind the same gzip envelope:

        - v2 (default): pickle of ("IAFEATv2", kp (n,2) f32, meta (n,4) f32)
          numpy arrays — building + gzipping the reference's per-keypoint
          python tuples measured 230 ms/image on a 1-core host
          (scripts_dev/profile_detect_host.py), ~30× the array form, and
          detection wall-clock is host-bound at mission scale;
        - legacy (IMAGEANALYSIS_TPU_LEGACY_FEAT=1): the reference's list of
          (pt, size, angle, response, octave, class_id) tuples, byte-
          compatible with reference image.py:192-208 for projects that
          must round-trip back to the reference tooling.

        load_features reads both (and the reference's own files)."""
        if os.environ.get("IMAGEANALYSIS_TPU_LEGACY_FEAT"):
            pts = self.kp.astype(float).tolist()
            meta = self.kp_meta.astype(float).tolist()
            payload = [
                ((p[0], p[1]), m[0], m[1], m[2], int(m[3]), -1)
                for p, m in zip(pts, meta)
            ]
        else:
            payload = ("IAFEATv2",
                       np.ascontiguousarray(self.kp, np.float32),
                       np.ascontiguousarray(self.kp_meta, np.float32))
        with gzip.open(self.features_file, "wb", compresslevel=1) as f:
            pickle.dump(payload, f)

    def load_features(self) -> bool:
        if not os.path.exists(self.features_file):
            return False
        with gzip.open(self.features_file, "rb") as f:
            feature_list = pickle.load(f)
        if isinstance(feature_list, tuple) and len(feature_list) == 3 \
                and feature_list[0] == "IAFEATv2":
            self.kp = np.asarray(feature_list[1], np.float32).reshape(-1, 2)
            self.kp_meta = np.asarray(feature_list[2],
                                      np.float32).reshape(-1, 4)
            return True
        n = len(feature_list)
        self.kp = np.array([p[0] for p in feature_list],
                           np.float32).reshape(n, 2)
        self.kp_meta = np.array([p[1:5] for p in feature_list],
                                np.float32).reshape(n, 4)
        return True

    def save_descriptors(self):
        """SIFT descriptors are integer-valued 0..255 (cv2 saturate_cast and
        our TPU detector both emit uint8-exact floats), so store them as
        uint8: exact, 4× smaller, and gzip runs ~20× faster than on f32
        bytes — descriptor cache writes were a visible slice of per-image
        detect wall on a 1-core host. np.load self-describes dtype, so the
        .desc format stays readable either way; load converts back to f32."""
        des = self.des
        if des is not None and des.dtype != np.uint8 and des.size:
            if des.min() >= 0 and des.max() <= 255 \
                    and np.array_equal(des, np.round(des)):
                des = des.astype(np.uint8)
        if des is not None and des.dtype == np.uint8:
            # raw .npy: gzip level 1 on SIFT uint8 descriptors still cost
            # ~38 ms/image of the 1-core host budget for ~25% shrink —
            # detect wall is host-bound, disk is not the bottleneck
            with open(self.desc_file, "wb") as f:
                np.save(f, des)
        else:
            with gzip.open(self.desc_file, "wb", compresslevel=6) as f:
                np.save(f, des)

    def load_descriptors(self) -> bool:
        if self.des is not None:
            return True
        if not os.path.exists(self.desc_file):
            return False
        with open(self.desc_file, "rb") as f:
            magic = f.read(2)
        if magic == b"\x1f\x8b":              # gzip envelope (incl. reference)
            with gzip.open(self.desc_file, "rb") as f:
                self.des = np.load(f)
        else:                                  # raw .npy
            self.des = np.load(self.desc_file)
        if self.des is not None and self.des.dtype == np.uint8:
            self.des = self.des.astype(np.float32)
        return True

    def unload_descriptors(self):
        self.des = None

    def save_matches(self):
        with open(self.match_file, "wb") as f:
            pickle.dump(self.match_list, f)
        self.matches_clean = True

    def load_matches(self) -> bool:
        if not os.path.exists(self.match_file):
            return False
        with open(self.match_file, "rb") as f:
            self.match_list = pickle.load(f)
        self.matches_clean = True
        return True


class ProjectMgr:
    """Workspace lifecycle (reference project.py:23-125)."""

    def __init__(self, project_dir: str, create: bool = False):
        self.project_dir = project_dir
        self.analysis_dir = os.path.join(project_dir, "ImageAnalysis")
        self.meta_dir = os.path.join(self.analysis_dir, "meta")
        self.cache_dir = os.path.join(self.analysis_dir, "cache")
        self.state_dir = os.path.join(self.analysis_dir, "state")
        self.models_dir = os.path.join(self.analysis_dir, "models")
        self.image_list: list[ImageRecord] = []
        if create:
            for d in (self.analysis_dir, self.meta_dir, self.cache_dir,
                      self.state_dir):
                os.makedirs(d, exist_ok=True)
        elif not os.path.isdir(self.analysis_dir):
            raise FileNotFoundError(f"analysis dir doesn't exist: {self.analysis_dir}")
        logger.init(self.analysis_dir)
        self.state = state.StateMgr(self.state_dir)
        self.config = PropertyNode()
        self.config_file = os.path.join(self.analysis_dir, "config.json")
        if os.path.isfile(self.config_file):
            self.config = PropertyNode.load_json(self.config_file)
        self.config.node("directories").set("project_dir", project_dir)

    # -- config -----------------------------------------------------------
    def save(self):
        self.config.save_json(self.config_file)

    @property
    def camera(self) -> PropertyNode:
        return self.config.node("camera")

    def detect_camera(self) -> str:
        """Camera key from the first image's EXIF (reference project.py:127)."""
        from . import exif
        files = self.image_files()
        if not files:
            return ""
        key, _, _, _ = exif.get_camera_info(os.path.join(self.project_dir, files[0]))
        return key

    def set_camera_config(self, cfg: dict):
        self.camera.update(cfg)

    def camera_model(self, optimized=False):
        return camera_db.to_model(self.camera.as_dict(), optimized=optimized)

    def get_mount_params(self):
        m = self.camera.node("mount")
        return [m.get("yaw_deg", 0.0), m.get("pitch_deg", 0.0), m.get("roll_deg", 0.0)]

    def get_body2cam(self):
        y, p, r = self.get_mount_params()
        return np.asarray(quat_from_ypr(y * D2R, p * D2R, r * D2R))

    # -- images -----------------------------------------------------------
    def image_files(self):
        out = []
        for f in os.listdir(self.project_dir):
            if fnmatch.fnmatch(f, "*.jpg") or fnmatch.fnmatch(f, "*.JPG") \
               or fnmatch.fnmatch(f, "*.jpeg") or fnmatch.fnmatch(f, "*.png"):
                out.append(f)
        return sorted(out)

    def load_images_info(self):
        """Populate image_list from meta/*.json (reference project.py:146)."""
        self.image_list = []
        if not os.path.isdir(self.meta_dir):
            return
        for f in sorted(os.listdir(self.meta_dir)):
            if f.endswith(".json"):
                self.image_list.append(ImageRecord(self.analysis_dir, f[:-5]))

    def image_by_name(self, name: str) -> ImageRecord | None:
        for im in self.image_list:
            if im.name == name:
                return im
        return None

    def image_path(self, image: ImageRecord) -> str:
        for ext in (".jpg", ".JPG", ".jpeg", ".png"):
            p = os.path.join(self.project_dir, image.name + ext)
            if os.path.isfile(p):
                return p
        return os.path.join(self.project_dir, image.name + ".jpg")

    # -- reference frame --------------------------------------------------
    def compute_ned_reference_lla(self):
        """Average image lat/lon, alt 0 (reference project.py:239-255)."""
        lats, lons = [], []
        for im in self.image_list:
            n = im.node.node("aircraft_pose", create=False)
            if n and n.has("lat_deg"):
                lats.append(n.get("lat_deg"))
                lons.append(n.get("lon_deg"))
        ned_node = self.config.node("ned_reference")
        ned_node.set("lat_deg", float(np.mean(lats)))
        ned_node.set("lon_deg", float(np.mean(lons)))
        ned_node.set("alt_m", 0.0)

    def ned_reference_lla(self):
        n = self.config.node("ned_reference")
        return [n.get("lat_deg", 0.0), n.get("lon_deg", 0.0), n.get("alt_m", 0.0)]

    # -- matches (unified structure) --------------------------------------
    def save_matches_grouped(self, matches, name="matches_grouped"):
        with open(os.path.join(self.analysis_dir, name), "wb") as f:
            pickle.dump(matches, f, protocol=pickle.HIGHEST_PROTOCOL)

    def load_matches_grouped(self, name="matches_grouped"):
        with open(os.path.join(self.analysis_dir, name), "rb") as f:
            return pickle.load(f)

    # -- undistortion helpers --------------------------------------------
    def undistort_image_keypoints(self, image: ImageRecord, optimized=False):
        """Populate image.uv_list with undistorted kp coords (reference
        project.py:278-296) — host numpy (see undistort_pixels_np: device
        dispatch/compile overheads dominate this op on tunneled
        runtimes)."""
        if image.kp is None or len(image.kp) == 0:
            image.uv_list = np.zeros((0, 2), np.float32)
            return
        from ..core.camera import undistort_pixels_np

        model = self.camera_model(optimized)
        image.uv_list = undistort_pixels_np(image.kp, np.asarray(model.K),
                                            np.asarray(model.dist))

    def undistort_all_keypoints(self, images=None, optimized=False):
        """Bulk uv_list fill for MANY images in one vectorized host pass
        (see undistort_pixels_np for why this is numpy, not a device
        call)."""
        # `images=[]` means "nothing to do", not "all images" — only None
        # falls back to the full project list
        pool = self.image_list if images is None else images
        images = [im for im in pool if im.uv_list is None]
        if not images:
            return
        for im in images:
            if im.kp is None:
                im.load_features()
        # images whose features failed to load keep uv_list=None so the
        # downstream `uv_list is None` checks behave like the per-image path
        images = [im for im in images if im.kp is not None]
        if not images:
            return
        from ..core.camera import undistort_pixels_np

        counts = [len(im.kp) for im in images]
        model = self.camera_model(optimized)
        # pure-numpy bulk path: flat 1-D device arrays executed ~23× slow
        # (1-lane layouts) — 40.7 s for the 2812 mission's 5.7M keypoints —
        # and the (m, 256) form pays a ~110 s remote compile per process;
        # vectorized host numpy does the same fixed-point iteration in
        # ~3 s with no compile and no transfers
        kp_all = np.concatenate(
            [im.kp if counts[i] else np.zeros((0, 2), np.float32)
             for i, im in enumerate(images)]).astype(np.float32)
        uv_all = undistort_pixels_np(kp_all, np.asarray(model.K),
                                     np.asarray(model.dist))
        pos = 0
        for i, im in enumerate(images):
            im.uv_list = uv_all[pos:pos + counts[i]]
            pos += counts[i]
