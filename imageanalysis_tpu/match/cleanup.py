"""Match consolidation: dedup, chain linking, initial triangulation.

Reference match_cleanup.py:

- ``merge_duplicates`` (:19-103): SIFT emits multiple keypoints at the same
  uv (one per orientation); collapse them to one canonical keypoint per uv
  before linking.
- ``make_match_structure``+``link_matches`` (:190-301): turn pair matches
  into multi-image chains. The reference fixed-point-iterates a dict merge;
  here it's a single union-find pass over (image, canonical_kp) nodes —
  same fixed point, O(α) per edge.  When transitivity puts two different
  keypoints of one image in a chain, the extra observation is dropped
  (lowest kp index wins), matching the reference's keep-first behavior
  (match_cleanup.py:252-262).
- chains store raw uv instead of kp indices (match_cleanup.py:281-286) and
  are sorted longest-first (:292).
- ``triangulate_smart`` (:303-347): initial 3D estimate per chain = average
  of per-observation ground intersections at each image's base elevation.
  Batched on device here; we project **undistorted** uv (the reference
  projects raw uv through K⁻¹ — a small approximation we don't reproduce).

Output contract — the pipeline's central object (SURVEY.md §1):
``match = [ned|None, group_id(-1), [img_idx, [u,v]], [img_idx, [u,v]], ...]``
pickled as ``matches_grouped``.
"""

from __future__ import annotations

import numpy as np

from ..io.logger import log


class UnionFind:
    def __init__(self, n):
        self.parent = np.arange(n, dtype=np.int64)

    def find(self, x):
        root = x
        p = self.parent
        while p[root] != root:
            root = p[root]
        while p[x] != root:
            p[x], x = root, p[x]
        return root

    def union(self, a, b):
        ra, rb = self.find(a), self.find(b)
        if ra != rb:
            self.parent[rb] = ra


def canonical_kp_maps(proj):
    """Per image: kp index → canonical kp index (first with identical uv).

    Reference merge_duplicates (match_cleanup.py:19-103).
    """
    maps = []
    total_dup = 0
    for image in proj.image_list:
        if image.kp is None:
            image.load_features()
        kp = image.kp if image.kp is not None else np.zeros((0, 2), np.float32)
        canon = np.arange(len(kp), dtype=np.int64)
        seen = {}
        for k in range(len(kp)):
            key = (float(kp[k, 0]), float(kp[k, 1]))
            if key in seen:
                canon[k] = seen[key]
                total_dup += 1
            else:
                seen[key] = k
        maps.append(canon)
    log("Canonicalized duplicate keypoints:", total_dup)
    return maps


def link_matches(proj):
    """Pair match lists → unified chain structure via union-find.

    Returns matches: list of [None, -1, [i, [u,v]], ...] sorted longest-first.
    """
    name_to_idx = {im.name: i for i, im in enumerate(proj.image_list)}
    canon = canonical_kp_maps(proj)

    # collect edges as flat node ids: node = offset[i] + canonical_kp
    offsets = np.zeros(len(proj.image_list) + 1, np.int64)
    for i, c in enumerate(canon):
        offsets[i + 1] = offsets[i] + len(c)
    n_nodes = int(offsets[-1])
    uf = UnionFind(n_nodes)

    n_edges = 0
    for i, image in enumerate(proj.image_list):
        if not image.match_list:
            image.load_matches()
        for other, pairs in image.match_list.items():
            j = name_to_idx.get(other)
            if j is None or j <= i:
                continue
            for a, b in pairs:
                na = offsets[i] + canon[i][a]
                nb = offsets[j] + canon[j][b]
                uf.union(na, nb)
                n_edges += 1
    log("Total feature pairs in image set:", n_edges)

    # gather components that actually appear in matches
    used_nodes = set()
    for i, image in enumerate(proj.image_list):
        for other, pairs in image.match_list.items():
            j = name_to_idx.get(other)
            if j is None or j <= i:
                continue
            for a, b in pairs:
                used_nodes.add(int(offsets[i] + canon[i][a]))
                used_nodes.add(int(offsets[j] + canon[j][b]))

    comps = {}
    for node in used_nodes:
        root = uf.find(node)
        comps.setdefault(root, []).append(node)

    matches = []
    dropped_obs = 0
    for nodes in comps.values():
        if len(nodes) < 2:
            continue
        per_image = {}
        for node in sorted(nodes):
            img = int(np.searchsorted(offsets, node, side="right") - 1)
            kpi = int(node - offsets[img])
            if img not in per_image:  # keep lowest kp index per image
                per_image[img] = kpi
            else:
                dropped_obs += 1
        if len(per_image) < 2:
            continue
        match = [None, -1]
        for img in sorted(per_image):
            kpi = per_image[img]
            uv = proj.image_list[img].kp[kpi]
            match.append([img, [float(uv[0]), float(uv[1])]])
        matches.append(match)

    matches.sort(key=len, reverse=True)
    if dropped_obs:
        log("Dropped inconsistent extra observations:", dropped_obs)
    total_obs = sum(len(m) - 2 for m in matches)
    if matches:
        log("Total unique features in image set:", len(matches))
        log("Keypoint average instances: %.2f" % (total_obs / len(matches)))
    return matches


def triangulate_ground(proj, matches, get_base_elev=None):
    """Initial 3D estimate: average per-observation ground intersection
    (reference match_cleanup.py:303-347). Batched on device.

    get_base_elev(image) → terrain elevation (m MSL, positive up) under the
    image; defaults to the smart/SRTM estimate when available, else 0.
    """
    import jax.numpy as jnp
    from ..core.camera import intersect_ground_plane, pixel_vectors_ned, undistort_pixels
    from ..core.rotations import quat_to_matrix

    cam = proj.camera_model()
    ref_alt = proj.ned_reference_lla()[2]

    # per-image arrays
    n_img = len(proj.image_list)
    cam_ned = np.zeros((n_img, 3), np.float32)
    cam_quat = np.zeros((n_img, 4), np.float32)
    base_elev = np.zeros(n_img, np.float32)
    for i, image in enumerate(proj.image_list):
        ned, _, quat = image.get_camera_pose()
        cam_ned[i] = ned
        cam_quat[i] = quat
        elev = float(get_base_elev(image)) if get_base_elev else 0.0
        # never above the camera (reference match_cleanup.py:320-321)
        if -ned[2] - 1 < elev:
            elev = -ned[2] - 1
        base_elev[i] = elev

    # flatten all observations
    obs_img, obs_uv, obs_match = [], [], []
    for mi, match in enumerate(matches):
        for img, uv in match[2:]:
            obs_img.append(img)
            obs_uv.append(uv)
            obs_match.append(mi)
    if not obs_img:
        return matches
    obs_img = np.asarray(obs_img, np.int32)
    obs_uv = np.asarray(obs_uv, np.float32)
    obs_match = np.asarray(obs_match, np.int64)

    uv_und = undistort_pixels(jnp.asarray(obs_uv), cam.K, cam.dist)
    body2ned = quat_to_matrix(jnp.asarray(cam_quat))[obs_img]
    vecs = pixel_vectors_ned(uv_und, body2ned, cam.K)
    # intersect_ground_plane's ground_m is terrain elevation above the NED
    # reference (plane sits at down = −ground_m), matching the reference's
    # intersectVectorsWithGroundPlane (project.py:553-565)
    elev_rel = jnp.asarray(base_elev - ref_alt)[obs_img]
    pts = intersect_ground_plane(jnp.asarray(cam_ned)[obs_img], elev_rel, vecs)
    pts = np.asarray(pts)

    sums = np.zeros((len(matches), 3), np.float64)
    counts = np.zeros(len(matches), np.int64)
    np.add.at(sums, obs_match, pts)
    np.add.at(counts, obs_match, 1)
    for mi, match in enumerate(matches):
        if counts[mi]:
            match[0] = (sums[mi] / counts[mi]).tolist()
    return matches
