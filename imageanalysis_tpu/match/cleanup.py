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


class MatchList(list):
    """The chain structure, plus optional flat observation arrays
    (obs_img, obs_uv, obs_match — aligned, chain-major in list order) that
    let the very next stage skip re-flattening millions of Python lists.
    Pickles as a PLAIN list: the arrays are derived data and would bloat
    the matches_grouped checkpoint; consumers revalidate and rebuild them
    when absent or stale (see triangulate_ground)."""

    obs_img = obs_uv = obs_match = None

    def __reduce__(self):
        return (list, (), None, iter(self))


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
        if len(kp):
            _, first_idx, inverse = np.unique(kp, axis=0, return_index=True,
                                              return_inverse=True)
            canon = first_idx[inverse].astype(np.int64)
            total_dup += int((canon != np.arange(len(kp))).sum())
        else:
            canon = np.zeros(0, np.int64)
        maps.append(canon)
    log("Canonicalized duplicate keypoints:", total_dup)
    return maps


def link_matches(proj):
    """Pair match lists → unified chain structure via union-find.

    Returns matches: list of [None, -1, [i, [u,v]], ...] sorted longest-first.
    """
    import scipy.sparse
    import scipy.sparse.csgraph

    name_to_idx = {im.name: i for i, im in enumerate(proj.image_list)}
    canon = canonical_kp_maps(proj)

    # collect edges as flat node ids: node = offset[i] + canonical_kp.
    # Everything below is array-at-a-time — the per-pair python loops took
    # ~90 s at 2812 images / 6.7M matches; this path takes seconds.
    offsets = np.zeros(len(proj.image_list) + 1, np.int64)
    for i, c in enumerate(canon):
        offsets[i + 1] = offsets[i] + len(c)
    n_nodes = int(offsets[-1])

    ea, eb = [], []
    for i, image in enumerate(proj.image_list):
        if not image.match_list:
            image.load_matches()
        for other, pairs in image.match_list.items():
            j = name_to_idx.get(other)
            if j is None or j <= i or len(pairs) == 0:
                continue
            arr = np.asarray(pairs, np.int64).reshape(-1, 2)
            ea.append(offsets[i] + canon[i][arr[:, 0]])
            eb.append(offsets[j] + canon[j][arr[:, 1]])
    if ea:
        ea = np.concatenate(ea)
        eb = np.concatenate(eb)
    else:
        ea = eb = np.zeros(0, np.int64)
    log("Total feature pairs in image set:", len(ea))

    # connected components over the keypoint graph (C implementation)
    g = scipy.sparse.coo_matrix(
        (np.ones(len(ea), np.int8), (ea, eb)), shape=(n_nodes, n_nodes))
    _, labels = scipy.sparse.csgraph.connected_components(g, directed=False)

    used = np.unique(np.concatenate([ea, eb]))
    lab = labels[used]
    order = np.lexsort((used, lab))        # by component, then node id
    nodes = used[order]
    lab = lab[order]
    imgs = np.searchsorted(offsets, nodes, side="right") - 1
    kpis = nodes - offsets[imgs]

    # within each (component, image) keep the lowest kp index (nodes are
    # sorted, so the first row of each group wins); count the rest dropped
    grp_first = np.ones(len(nodes), bool)
    if len(nodes):
        grp_first[1:] = (lab[1:] != lab[:-1]) | (imgs[1:] != imgs[:-1])
    dropped_obs = int((~grp_first).sum())
    lab_f = lab[grp_first]
    imgs_f = imgs[grp_first]
    kpis_f = kpis[grp_first]

    # uv per observation: node ids index the concatenated kp table directly
    all_kp = np.concatenate(
        [im.kp if im.kp is not None and len(im.kp)
         else np.zeros((0, 2), np.float32) for im in proj.image_list])
    nodes_f = nodes[grp_first]
    uvs = all_kp[nodes_f]

    # assemble chains: observation items once, then C-speed list slicing.
    # Chains are built directly in longest-first order (stable, matching
    # list.sort(key=len, reverse=True)) so the flat observation arrays can
    # be attached in final order for the next stage.
    comp_ids, comp_starts, comp_sizes = np.unique(
        lab_f, return_index=True, return_counts=True)
    obs_items = [[i, uv] for i, uv in zip(imgs_f.tolist(), uvs.tolist())]
    keep = comp_sizes >= 2
    k_starts = comp_starts[keep]
    k_sizes = comp_sizes[keep]
    order = np.argsort(-k_sizes, kind="stable")
    k_starts = k_starts[order]
    k_sizes = k_sizes[order]
    matches = MatchList()
    for s, size in zip(k_starts.tolist(), k_sizes.tolist()):
        matches.append([None, -1] + obs_items[s:s + size])

    total = int(k_sizes.sum())
    base = np.repeat(k_starts, k_sizes)
    within = np.arange(total, dtype=np.int64) \
        - np.repeat(np.cumsum(k_sizes) - k_sizes, k_sizes)
    sel = base + within
    matches.obs_img = imgs_f[sel].astype(np.int32)
    matches.obs_uv = uvs[sel].astype(np.float32)
    matches.obs_match = np.repeat(
        np.arange(len(k_sizes), dtype=np.int64), k_sizes)
    if dropped_obs:
        log("Dropped inconsistent extra observations:", dropped_obs)
    total_obs = sum(len(m) - 2 for m in matches)
    if matches:
        log("Total unique features in image set:", len(matches))
        log("Keypoint average instances: %.2f" % (total_obs / len(matches)))
    return matches


def triangulate_ground(proj, matches, get_base_elev=None, subset=None,
                       optimized=False):
    """Initial 3D estimate: average per-observation ground intersection
    (reference match_cleanup.py:303-347). Batched on device.

    get_base_elev(image) → terrain elevation (m MSL, positive up) under the
    image; defaults to the smart/SRTM estimate when available, else 0.

    subset: optional iterable of chain indices — only those chains are
    recomputed (others untouched). optimized=True reads each image's
    optimized camera pose when valid (raw otherwise, reference
    image.py:462-481 semantics). Together these serve the post-BA
    refresh: chains BA did not optimize keep points derived from the
    PRE-BA poses, and any gauge drift BA leaves along weakly-constrained
    modes (e.g. roll about a single-strip track — position-bounded but
    attitude-free) makes those stale points reproject arbitrarily badly
    under the optimized poses (measured 12.5 px RMSE on group-0 2-chains
    vs 0.3 on BA-active chains, PARITY_r5 analysis)."""
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
        opt = optimized and image.has_opt_pose()
        ned, _, quat = image.get_camera_pose(opt=opt)
        cam_ned[i] = ned
        cam_quat[i] = quat
        elev = float(get_base_elev(image)) if get_base_elev else 0.0
        # never above the camera (reference match_cleanup.py:320-321)
        if -ned[2] - 1 < elev:
            elev = -ned[2] - 1
        base_elev[i] = elev

    # flat observation arrays: reuse link_matches' (attached on MatchList,
    # validated against the chain structure — culls mutate chains without
    # refreshing them), else flatten the Python lists
    total_obs = sum(len(m) - 2 for m in matches)
    flat = getattr(matches, "obs_img", None)
    if flat is not None and len(flat) == total_obs \
            and len(getattr(matches, "obs_match", ())) == total_obs \
            and (total_obs == 0
                 or int(matches.obs_match[-1]) == len(matches) - 1):
        obs_img = matches.obs_img
        obs_uv = matches.obs_uv
        obs_match = matches.obs_match
    else:
        obs_img, obs_uv, obs_match = [], [], []
        for mi, match in enumerate(matches):
            for img, uv in match[2:]:
                obs_img.append(img)
                obs_uv.append(uv)
                obs_match.append(mi)
        obs_img = np.asarray(obs_img, np.int32)
        obs_uv = np.asarray(obs_uv, np.float32)
        obs_match = np.asarray(obs_match, np.int64)
    if subset is not None:
        keep = np.zeros(len(matches), bool)
        idx = np.fromiter(subset, dtype=np.int64)
        if len(idx):
            keep[idx] = True
        sel = keep[obs_match]
        obs_img, obs_uv, obs_match = obs_img[sel], obs_uv[sel], \
            obs_match[sel]
        total_obs = int(sel.sum())
    if total_obs == 0:
        return matches

    # pad the device call to the next power of two: exact per-mission
    # shapes defeat the persistent compile cache (every obs count is
    # unique), and the padded elementwise compute is device-trivial
    npad = max(1 << int(np.ceil(np.log2(max(total_obs, 1)))), 1 << 14)
    uv_p = np.zeros((npad, 2), np.float32)
    uv_p[:total_obs] = obs_uv
    img_p = np.zeros(npad, np.int32)
    img_p[:total_obs] = obs_img

    uv_und = undistort_pixels(jnp.asarray(uv_p), cam.K, cam.dist)
    body2ned = quat_to_matrix(jnp.asarray(cam_quat))[img_p]
    vecs = pixel_vectors_ned(uv_und, body2ned, cam.K)
    # intersect_ground_plane's ground_m is terrain elevation above the NED
    # reference (plane sits at down = −ground_m), matching the reference's
    # intersectVectorsWithGroundPlane (project.py:553-565)
    elev_rel = jnp.asarray(base_elev - ref_alt)[img_p]
    pts = intersect_ground_plane(jnp.asarray(cam_ned)[img_p], elev_rel, vecs)
    pts = np.asarray(pts)[:total_obs]

    # per-chain means via bincount (np.add.at is ~10× slower at 4M obs)
    n_m = len(matches)
    counts = np.bincount(obs_match, minlength=n_m)
    denom = np.maximum(counts, 1)
    means = np.stack([np.bincount(obs_match, weights=pts[:, k].astype(
        np.float64), minlength=n_m) / denom for k in range(3)], axis=1)
    means_l = means.tolist()
    counts_l = counts.tolist()
    for mi, match in enumerate(matches):
        if counts_l[mi]:
            match[0] = means_l[mi]
    return matches
