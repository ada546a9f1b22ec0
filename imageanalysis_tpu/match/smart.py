""""Smart" priors: per-image surface elevation + yaw-error estimates.

Reference smart.py: after each pair is matched, (a) triangulate the pair's
matches and keep a distance²-weighted average ground elevation per image
(``tri_surface_m``; pairs with stddev ≥ 25 m are distrusted), and (b) fit a
2-D similarity between the matched uv sets, project image 2's center into
image 1, and compare the implied course against the GPS ground course to
estimate a per-image heading bias (``yaw_error``). Persisted to smart.json.

These priors are what let the reference stitch missions "pix4d is unable to
stitch" (README-DataSets.md): better ground elevations improve the
projection seeding, and yaw corrections fix poses from ground-course-derived
headings. Here the triangulation and similarity fits run batched on device;
the bookkeeping matches the reference's smart.json schema
(smart.py:194-339).
"""

from __future__ import annotations

import json
import os
from math import atan2, pi

import jax
import jax.numpy as jnp
import numpy as np

from ..io.logger import log, qlog

R2D = 180.0 / pi
CUTOFF_STD = 25.0      # reference smart.py:221
YAW_MAX = 30.0         # reference smart.py:276
YAW_MIN_DIST = 0.5     # reference smart.py:276


class SmartState:
    """The /smart property tree (reference smart_node), as plain dicts."""

    def __init__(self, analysis_dir: str):
        self.analysis_dir = analysis_dir
        self.data: dict = {}
        self.load()

    # -- persistence (smart.json contract) --------------------------------
    def path(self):
        return os.path.join(self.analysis_dir, "smart.json")

    def load(self):
        if os.path.isfile(self.path()):
            with open(self.path()) as f:
                self.data = json.load(f)

    def save(self):
        with open(self.path(), "w") as f:
            json.dump(self.data, f, indent=4, sort_keys=True)

    def node(self, image_name: str) -> dict:
        return self.data.setdefault(image_name, {})

    # -- surface ----------------------------------------------------------
    def update_surface_pair(self, name1, name2, surface_m, stddev, dist_m):
        """Record a pairwise triangulated elevation and refresh both images'
        weighted ``tri_surface_m`` (reference update_surface_estimate)."""
        weight = int(dist_m * dist_m)
        for a, b in ((name1, name2), (name2, name1)):
            pairs = self.node(a).setdefault("tri_surface_pairs", {})
            pairs[b] = {"surface_m": round(float(surface_m), 1),
                        "weight": weight,
                        "stddev": round(float(stddev), 1),
                        "dist_m": int(dist_m)}
            self._refresh_surface(a)

    def _refresh_surface(self, name):
        pairs = self.node(name).get("tri_surface_pairs", {})
        s = c = 0.0
        for rec in pairs.values():
            if rec["stddev"] < CUTOFF_STD:
                s += rec["surface_m"] * rec["weight"]
                c += rec["weight"]
        if c > 0:
            self.node(name)["tri_surface_m"] = round(s / c, 1)

    def get_surface(self, name1, name2=None):
        """Average triangulated elevation under the pair, SRTM fallback
        (reference get_surface_estimate)."""
        names = [name1] + ([name2] if name2 else [])
        vals = [self.node(n)["tri_surface_m"] for n in names
                if "tri_surface_m" in self.node(n)]
        if vals:
            return float(np.mean(vals))
        srtm_vals = [self.node(n).get("srtm_surface_m", 0.0) for n in names]
        ground = float(np.mean(srtm_vals))
        qlog("  SRTM ground (no triangulation yet): %.1f" % ground)
        return ground

    # -- yaw error --------------------------------------------------------
    def update_yaw_pair(self, name1, name2, yaw_error, dist_m, crs_aff, weight):
        yaw_pairs = self.node(name1).setdefault("yaw_pairs", {})
        yaw_pairs[name2] = {"yaw_error": round(float(yaw_error), 1),
                            "dist_m": round(float(dist_m), 1),
                            "relative_crs": round(float(crs_aff), 1),
                            "weight": round(float(weight), 1)}
        return self._refresh_yaw(name1)

    def _refresh_yaw(self, name):
        s = c = 0.0
        for rec in self.node(name).get("yaw_pairs", {}).values():
            if rec["dist_m"] >= YAW_MIN_DIST and abs(rec["yaw_error"]) <= YAW_MAX:
                s += rec["yaw_error"] * rec["weight"]
                c += rec["weight"]
        if c > 0:
            self.node(name)["yaw_error"] = round(s / c, 1)
            return s / c
        return 0.0

    def get_yaw_error(self, name):
        return float(self.node(name).get("yaw_error", 0.0))

    # -- multi-host shard merge -------------------------------------------
    def save_shard(self, path):
        """Persist this rank's accumulated state as a shard file (atomic)."""
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(self.data, f)
        os.replace(tmp, path)

    def merge_shard_data(self, other: dict):
        """Union another rank's pairwise evidence into this state and refresh
        the per-image aggregates. Pairs are disjoint across ranks (the match
        work list is sharded), so a key-wise union of tri_surface_pairs /
        yaw_pairs is exact; the weighted means are then recomputed from the
        full evidence — without this, N-host runs silently dropped
        (N−1)/N of the yaw evidence (rank 0's shard only)."""
        touched = set()
        for name, node in other.items():
            mine = self.node(name)
            for key in ("tri_surface_pairs", "yaw_pairs"):
                if node.get(key):
                    mine.setdefault(key, {}).update(node[key])
                    touched.add(name)
            for k, v in node.items():
                if k not in ("tri_surface_pairs", "yaw_pairs",
                             "tri_surface_m", "yaw_error") and k not in mine:
                    mine[k] = v
        for name in touched:
            self._refresh_surface(name)
            self._refresh_yaw(name)

    def update_srtm_elevations(self, proj, terrain):
        """srtm_surface_m under each camera (reference smart.py:319-326).
        One batched interp call — a per-image eager device op costs a
        round trip per image on tunneled runtimes."""
        import numpy as np

        neds = np.array([image.get_camera_pose()[0]
                         for image in proj.image_list], np.float32)
        if len(neds) == 0:
            return
        elevs = np.asarray(terrain.interp_host(neds[:, 0], neds[:, 1]))
        for image, e in zip(proj.image_list, np.atleast_1d(elevs)):
            self.node(image.name)["srtm_surface_m"] = round(float(e), 1)


# ---------------------------------------------------------------------------
# batched pair estimators
# ---------------------------------------------------------------------------

_tri_jit = None
_fit_sim = None


def _fit_sim_jit(a, b, w):
    global _fit_sim
    if _fit_sim is None:
        import jax

        from ..core.transforms import fit_similarity_2d

        _fit_sim = jax.jit(fit_similarity_2d)
    return _fit_sim(a, b, w)


def _triangulate_jit(P1, P2, n1, n2):
    global _tri_jit
    if _tri_jit is None:
        import jax

        from ..ops.triangulate import triangulate_two_view

        _tri_jit = jax.jit(triangulate_two_view,
                           static_argnames=("gn_iters",))
    return _tri_jit(P1, P2, n1, n2)


def triangulate_pair(proj, i1, i2):
    """Triangulate one pair's matches with current poses → (N, 3) NED
    (reference smart.py:26-63; cv2.triangulatePoints on K⁻¹-normalized uv)."""
    import jax.numpy as jnp

    from ..core.camera import ned_quat_to_rt, pixels_to_normalized
    from ..ops.triangulate import triangulate_two_view

    pairs = i1.match_list.get(i2.name, [])
    if len(pairs) == 0:
        return None
    if i1.kp is None:
        i1.load_features()
    if i2.kp is None:
        i2.load_features()
    model = proj.camera_model()
    n = len(pairs)
    # bucket the match count to a static shape — per-pair dynamic shapes
    # would trigger a fresh XLA compile for every image pair
    n_pad = max(256, 1 << (n - 1).bit_length())
    uv1 = np.zeros((n_pad, 2), np.float32)
    uv2 = np.zeros((n_pad, 2), np.float32)
    uv1[:n] = [i1.kp[a] for a, _ in pairs]
    uv2[:n] = [i2.kp[b] for _, b in pairs]
    ned1, _, q1 = i1.get_camera_pose()
    ned2, _, q2 = i2.get_camera_pose()
    R1, t1 = ned_quat_to_rt(jnp.asarray(ned1, dtype=jnp.float32),
                            jnp.asarray(q1, dtype=jnp.float32))
    R2, t2 = ned_quat_to_rt(jnp.asarray(ned2, dtype=jnp.float32),
                            jnp.asarray(q2, dtype=jnp.float32))
    P1 = jnp.concatenate([R1, t1[:, None]], axis=1)
    P2 = jnp.concatenate([R2, t2[:, None]], axis=1)
    n1 = pixels_to_normalized(jnp.asarray(uv1), model.K)
    n2 = pixels_to_normalized(jnp.asarray(uv2), model.K)
    pts = _triangulate_jit(P1, P2, n1, n2)
    return np.asarray(pts)[:n]


def estimate_surface_elevation(proj, i1, i2):
    """(avg_elev_m, std, baseline_m) for a pair (reference smart.py:117-130).
    Elevation is −down of the triangulated points."""
    pts = triangulate_pair(proj, i1, i2)
    ned1, _, _ = i1.get_camera_pose()
    ned2, _, _ = i2.get_camera_pose()
    dist_m = float(np.linalg.norm(np.asarray(ned2) - np.asarray(ned1)))
    if pts is None:
        return None, None, dist_m
    return float(-np.mean(pts[:, 2])), float(np.std(pts[:, 2])), dist_m


def estimate_yaw_error(proj, i1, i2):
    """(yaw_error_deg, dist_m, crs_aff, weight) (reference smart.py:138-190)."""
    import jax.numpy as jnp

    from ..core.transforms import decompose_affine_2d, fit_similarity_2d

    pairs = i1.match_list.get(i2.name, [])
    if len(pairs) < 2:
        return None
    if i1.kp is None:
        i1.load_features()
    if i2.kp is None:
        i2.load_features()
    # bucketed static shapes (weight-0 padding) — see triangulate_pair
    n = len(pairs)
    n_pad = max(256, 1 << (n - 1).bit_length())
    uv1 = np.zeros((n_pad, 2), np.float32)
    uv2 = np.zeros((n_pad, 2), np.float32)
    w = np.zeros(n_pad, np.float32)
    uv1[:n] = [i1.kp[a] for a, _ in pairs]
    uv2[:n] = [i2.kp[b] for _, b in pairs]
    w[:n] = 1.0
    A = np.asarray(_fit_sim_jit(jnp.asarray(uv2), jnp.asarray(uv1),
                                jnp.asarray(w)))
    _, tx, ty, _, _ = (float(x) for x in decompose_affine_2d(jnp.asarray(A)))
    weight = abs(ty / tx) if abs(ty) > 0 and tx != 0 else abs(tx)

    ned1, _, _ = i1.get_camera_pose()
    ned2, _, _ = i2.get_camera_pose()
    diff = np.asarray(ned2) - np.asarray(ned1)
    dist = float(np.linalg.norm(diff))
    if dist < 1e-6:
        return None
    dirv = diff / dist
    crs_gps = 90 - atan2(dirv[0], dirv[1]) * R2D
    crs_gps %= 360

    w = int(proj.camera.get("width_px", 0))
    h = int(proj.camera.get("height_px", 0))
    c = np.array([w * 0.5, h * 0.5, 1.0])
    newc = A @ c
    cdiff = [newc[0] - c[0], c[1] - newc[1]]
    crs_aff = 90 - atan2(cdiff[1], cdiff[0]) * R2D
    _, air_ypr1, _ = i1.get_aircraft_pose()
    crs_fit = air_ypr1[0] + crs_aff
    yaw_error = crs_gps - crs_fit
    while yaw_error < -180:
        yaw_error += 360
    while yaw_error > 180:
        yaw_error -= 360
    return yaw_error, dist, crs_aff, weight


def pair_surface_stats_batched(proj, pair_list, chunk=256):
    """Triangulated (avg_elev, std, baseline) for many pairs in few device
    calls: pairs are bucketed by padded match count, stacked, and solved
    with one vmapped two-view triangulation per bucket chunk. Per-pair
    device round trips at mission scale dominate wall-clock otherwise.

    pair_list: [(i1, i2), ...] ImageRecord pairs with non-empty match_list.
    Returns list of (avg, std, dist_m) aligned with pair_list.
    """
    import jax
    import jax.numpy as jnp

    from ..core.camera import ned_quat_to_rt, pixels_to_normalized
    from ..ops.triangulate import triangulate_two_view

    if not pair_list:  # a mission with zero surviving matches
        return [], []

    model = proj.camera_model()

    # one batched device call for every involved camera's projection
    # matrix — per-pair eager ned_quat_to_rt calls cost a device round
    # trip each (~0.2 s on tunneled runtimes; this loop dominated Step 3a)
    uniq = {}
    for i1, i2 in pair_list:
        for im in (i1, i2):
            if im.name not in uniq:
                uniq[im.name] = im
    names = list(uniq)
    neds = np.array([uniq[nm].get_camera_pose()[0] for nm in names],
                    np.float32)
    quats = np.array([uniq[nm].get_camera_pose()[2] for nm in names],
                     np.float32)
    R_all, t_all = ned_quat_to_rt(jnp.asarray(neds), jnp.asarray(quats))
    P_all = np.asarray(jnp.concatenate([R_all, t_all[..., None]], axis=-1))
    P_by_name = {nm: P_all[i] for i, nm in enumerate(names)}
    ned_by_name = {nm: neds[i] for i, nm in enumerate(names)}

    # fixed-size subsample per pair: the elevation mean/std and the 4-param
    # similarity are statistics — 256 evenly strided matches estimate them
    # as well as all ~1500, and the fixed shape means ONE compiled graph
    # (no per-match-count buckets) and one device dispatch per chunk
    cap = 256
    results = [None] * len(pair_list)
    affines = [None] * len(pair_list)
    for s in range(0, len(pair_list), chunk):
        group = list(range(s, min(s + chunk, len(pair_list))))
        n_real = len(group)
        # two padded batch shapes only (64 / chunk): each variant is one
        # XLA compile, and small tails shouldn't pay the full-chunk upload
        B = 64 if n_real <= 64 else chunk
        group = group + [group[-1]] * (B - n_real)
        uv1 = np.zeros((B, cap, 2), np.float32)
        uv2 = np.zeros((B, cap, 2), np.float32)
        msk = np.zeros((B, cap), np.float32)
        P1 = np.zeros((B, 3, 4), np.float32)
        P2 = np.zeros((B, 3, 4), np.float32)
        dists = np.zeros(B)
        for bi, k in enumerate(group):
            i1, i2 = pair_list[k]
            pairs = i1.match_list[i2.name]
            if i1.kp is None:
                i1.load_features()
            if i2.kp is None:
                i2.load_features()
            arr = np.asarray(pairs, np.int64).reshape(-1, 2)
            if len(arr) > cap:
                arr = arr[np.linspace(0, len(arr) - 1, cap).astype(int)]
            n = len(arr)
            uv1[bi, :n] = i1.kp[arr[:, 0]]
            uv2[bi, :n] = i2.kp[arr[:, 1]]
            msk[bi, :n] = 1.0
            P1[bi] = P_by_name[i1.name]
            P2[bi] = P_by_name[i2.name]
            dists[bi] = np.linalg.norm(ned_by_name[i2.name]
                                       - ned_by_name[i1.name])
        mean_z, std_z, A, cnt = _pair_stats_fused(
            jnp.asarray(P1), jnp.asarray(P2), jnp.asarray(uv1),
            jnp.asarray(uv2), jnp.asarray(msk), model.K)
        # one small download for the whole chunk (B scalars + B 2×3)
        mean_z = np.asarray(mean_z)
        std_z = np.asarray(std_z)
        A = np.asarray(A)
        cnt = np.asarray(cnt)
        for bi, k in enumerate(group[:n_real]):
            if cnt[bi] > 0:
                results[k] = (float(-mean_z[bi]), float(std_z[bi]),
                              float(dists[bi]))
                affines[k] = A[bi]
    return results, affines


@jax.jit
def _pair_stats_fused(P1, P2, uv1, uv2, msk, K):
    """Normalize → triangulate → masked z stats + uv2→uv1 similarity, one
    dispatch for a whole pair chunk. Downloading the full point clouds (and
    dispatching normalize/triangulate/fit separately) cost ~2.6 s per
    64-pair chunk on tunneled runtimes; this returns only per-pair scalars."""
    from ..core.camera import pixels_to_normalized
    from ..core.transforms import fit_similarity_2d
    from ..ops.triangulate import triangulate_two_view

    n1 = pixels_to_normalized(uv1, K)
    n2 = pixels_to_normalized(uv2, K)
    pts = jax.vmap(triangulate_two_view)(P1, P2, n1, n2)
    cnt = jnp.sum(msk, axis=-1)
    denom = jnp.maximum(cnt, 1.0)
    z = pts[..., 2]
    mean_z = jnp.sum(z * msk, axis=-1) / denom
    var_z = jnp.sum(msk * (z - mean_z[:, None]) ** 2, axis=-1) / denom
    A = jax.vmap(fit_similarity_2d)(uv2, uv1, msk)
    return mean_z, jnp.sqrt(var_z), A, cnt


def requalify_pairs(proj, smart: SmartState, std_cutoff=50.0):
    """Re-triangulate every matched pair with the (corrected) poses and
    discard pairs whose surface stddev still exceeds the cutoff — the
    reference's bad-geometry rejection (matcher.py:996-1005), run after
    yaw-error correction so heading bias doesn't condemn good pairs.
    Batched: a few device calls for the whole mission."""
    name_idx = {im.name: im for im in proj.image_list}
    pair_list = []
    for i1 in proj.image_list:
        for other in list(i1.match_list.keys()):
            i2 = name_idx.get(other)
            if i2 is None or len(i1.match_list[other]) == 0:
                continue
            if i1.name < other:  # each pair once
                pair_list.append((i1, i2))
    stats, _ = pair_surface_stats_batched(proj, pair_list)
    n_drop = 0
    for (i1, i2), st in zip(pair_list, stats):
        if st is None:
            continue
        avg, std, dist_m = st
        smart.update_surface_pair(i1.name, i2.name, avg, std, dist_m)
        if std >= std_cutoff:
            log("Matches suspect, big surface std:", i1.name, i2.name,
                "%.1f" % std, "- discarding pair")
            i1.match_list[i2.name] = []
            i2.match_list[i1.name] = []
            i1.matches_clean = False
            i2.matches_clean = False
            n_drop += 1
    for im in proj.image_list:
        if not im.matches_clean:
            im.save_matches()
    smart.save()
    return n_drop


def update_pair(proj, smart: SmartState, i1, i2):
    """Run both estimators for a freshly matched pair and record them
    (reference matcher.py:986-993 call sites)."""
    avg, std, dist_m = estimate_surface_elevation(proj, i1, i2)
    if avg is not None:
        smart.update_surface_pair(i1.name, i2.name, avg, std, dist_m)
    res = estimate_yaw_error(proj, i1, i2)
    if res is not None:
        smart.update_yaw_pair(i1.name, i2.name, *res)
    return avg, std


def _yaw_from_affine(proj, i1, i2, A):
    """Yaw-error math given a precomputed uv2→uv1 similarity (the host trig
    half of estimate_yaw_error). Pure numpy — a per-pair eager device op
    costs a round trip per pair on tunneled runtimes."""
    A = np.asarray(A)
    tx, ty = float(A[0, 2]), float(A[1, 2])
    weight = abs(ty / tx) if abs(ty) > 0 and tx != 0 else abs(tx)
    ned1, _, _ = i1.get_camera_pose()
    ned2, _, _ = i2.get_camera_pose()
    diff = np.asarray(ned2) - np.asarray(ned1)
    dist = float(np.linalg.norm(diff))
    if dist < 1e-6:
        return None
    dirv = diff / dist
    crs_gps = (90 - atan2(dirv[0], dirv[1]) * R2D) % 360
    w = int(proj.camera.get("width_px", 0))
    h = int(proj.camera.get("height_px", 0))
    c = np.array([w * 0.5, h * 0.5, 1.0])
    newc = np.asarray(A) @ c
    cdiff = [newc[0] - c[0], c[1] - newc[1]]
    crs_aff = 90 - atan2(cdiff[1], cdiff[0]) * R2D
    _, air_ypr1, _ = i1.get_aircraft_pose()
    yaw_error = crs_gps - (air_ypr1[0] + crs_aff)
    while yaw_error < -180:
        yaw_error += 360
    while yaw_error > 180:
        yaw_error -= 360
    return yaw_error, dist, crs_aff, weight


def update_pairs_batched(proj, smart: SmartState, pair_list):
    """Surface + yaw updates for many freshly matched pairs with a few
    device calls (replaces per-pair update_pair at mission scale, where the
    per-pair dispatch round trips dominate Step 3a wall-clock)."""
    pair_list = [(i1, i2) for i1, i2 in pair_list
                 if len(i1.match_list.get(i2.name, ())) > 0]
    if not pair_list:
        return
    stats, affines = pair_surface_stats_batched(proj, pair_list)
    for (i1, i2), st, A in zip(pair_list, stats, affines):
        if st is None:
            continue
        avg, std, dist_m = st
        smart.update_surface_pair(i1.name, i2.name, avg, std, dist_m)
        if A is not None:
            res = _yaw_from_affine(proj, i1, i2, A)
            if res is not None:
                smart.update_yaw_pair(i1.name, i2.name, *res)
