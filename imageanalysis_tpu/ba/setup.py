"""BA problem assembly from the unified match structure.

The reference's Optimizer.setup (optimizer.py:283-405): remap the group's
images to contiguous camera indices, filter chains shorter than
min_chain_len (=3), assemble camera_params / points_3d / observation arrays.
Observations keep the RAW (distorted) uv and the projection model applies the
distortion coefficients, exactly like the reference's cv2.projectPoints
residual.
"""

from __future__ import annotations

import numpy as np

from ..io.logger import log
from .bundle import BAObservations


def setup_from_matches(proj, matches, group_images=None, min_chain_len=3,
                       optimized=False):
    """Returns (cams0 (n,7), pts0 (m,3), obs, cam_names, match_index_map).

    group_images: list of image names to optimize (None = all);
    match_index_map[k] = index into ``matches`` for point k (to write
    optimized coordinates back).
    """
    if group_images is None:
        group_images = [im.name for im in proj.image_list]
    group_set = set(group_images)
    name_to_cam = {}
    cam_names = []
    cams0 = []
    for im in proj.image_list:
        if im.name in group_set:
            name_to_cam[im.name] = len(cam_names)
            cam_names.append(im.name)
            use_opt = optimized and im.has_opt_pose()
            ned, _, quat = im.get_camera_pose(opt=use_opt)
            cams0.append(np.r_[np.asarray(ned, np.float64),
                               np.asarray(quat, np.float64)])
    idx_to_cam = {i: name_to_cam[im.name] for i, im in enumerate(proj.image_list)
                  if im.name in name_to_cam}

    pts0, cam_idx, pt_idx, uvs, match_map = [], [], [], [], []
    skipped_short = 0
    for mi, match in enumerate(matches):
        obs = [(img, uv) for img, uv in match[2:] if img in idx_to_cam]
        if len(obs) < min_chain_len:
            skipped_short += 1
            continue
        if match[0] is None:
            continue
        k = len(pts0)
        pts0.append(match[0])
        match_map.append(mi)
        for img, uv in obs:
            cam_idx.append(idx_to_cam[img])
            pt_idx.append(k)
            uvs.append(uv)
    log(f"BA setup: {len(cam_names)} cameras, {len(pts0)} points, "
        f"{len(uvs)} observations ({skipped_short} short chains skipped)")

    obs = BAObservations(
        cam_idx=np.asarray(cam_idx, np.int32),
        pt_idx=np.asarray(pt_idx, np.int32),
        uv=np.asarray(uvs, np.float32),
        weight=np.ones(len(uvs), np.float32),
    )
    return (np.asarray(cams0, np.float32), np.asarray(pts0, np.float32), obs,
            cam_names, np.asarray(match_map, np.int64))


def write_back(proj, matches, result, cam_names, match_map):
    """Store optimized camera poses (camera_pose_opt) and point positions
    (match[0]) — reference Optimizer.update_camera_poses (optimizer.py:543)."""
    from ..core.hostmath import host_default_device
    from ..core.rotations import ypr_from_quat

    r2d = 180.0 / np.pi
    with host_default_device():
        _write_back_poses(proj, result, cam_names, ypr_from_quat, r2d)
    for k, mi in enumerate(match_map):
        matches[mi][0] = result.pts[k].tolist()


def _write_back_poses(proj, result, cam_names, ypr_from_quat, r2d):
    for ci, name in enumerate(cam_names):
        im = proj.image_by_name(name)
        if im is None:
            continue
        ned = result.cams[ci, :3].tolist()
        quat = result.cams[ci, 3:7]
        y, p, r = (float(a) * r2d for a in ypr_from_quat(quat))
        im.set_camera_pose(ned, y, p, r, opt=True, quat=np.asarray(quat))
        im.save_meta()
