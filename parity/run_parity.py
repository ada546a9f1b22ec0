#!/usr/bin/env python
"""Head-to-head fidelity run: the ACTUAL reference pipeline vs ours.

BASELINE.md's fidelity gate is "match graphs equivalent within RANSAC
tolerance; final reprojection RMSE <= the CPU pipeline's on the same
mission". This harness runs /root/reference/scripts/process.py itself (via
the pure-python shims in parity/shims for its missing deps: props,
props_json, navpy, transformations, piexif) and our pipeline on an
identical synthetic mission, then diffs:

  - the pair match graph (which image pairs are connected, Jaccard);
  - per-pair geometric agreement against the mission's ground-truth
    plane homography (both sides' matches must be GT-consistent);
  - chain statistics from matches_grouped;
  - final reprojection RMSE via ONE evaluator applied to both project
    dirs (identical on-disk contracts), and camera-position error vs
    the synthetic ground truth.

Usage:
  python parity/run_parity.py --n-images 20 --out PARITY_r4.json
  python parity/run_parity.py --work /tmp/parity_r4 --skip-ref   # reuse
"""

from __future__ import annotations

import argparse
import gzip
import json
import os
import pickle
import shutil
import struct
import subprocess
import sys
import time
import zipfile

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SHIMS = os.path.join(REPO, "parity", "shims")
REF_SCRIPTS = "/root/reference/scripts"

# this orchestrating process only generates images and compares outputs —
# pin its jax to CPU so mission generation (tiny quat ops) never blocks on
# the tunneled TPU worker's state; the pipelines run in subprocesses with
# their own backends. (JAX_PLATFORMS env is ignored by the axon plugin;
# the config update is the reliable switch.)
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


# --------------------------------------------------------------------------
# setup
# --------------------------------------------------------------------------

def make_mission(work, n_images, width, height, rows):
    """Generate the strip once under work/ref, hardlink into work/ours."""
    sys.path.insert(0, REPO)
    from imageanalysis_tpu.testing.synthetic import SyntheticMission
    from imageanalysis_tpu.io import camera_db

    ref_dir = os.path.join(work, "ref")
    ours_dir = os.path.join(work, "ours")
    fx = 1400.0 * width / 2176.0
    ground_w = width / fx * 100.0
    spacing = 0.25 * ground_w            # ~75% along-track overlap
    # rows=0: auto grid ~25 images/row (mission_bench policy). A single
    # 300-image row spans ~11 km — far off any fixed texture, so every
    # frame renders black and the reference's matcher divides by zero on
    # the first empty pair (matcher.py:232). Beyond the fixed texture's
    # coverage, switch to the procedural WorldTexture.
    rows = rows or max(n_images // 25, 1)
    per_row = max(n_images // rows, 1)
    tex_res = max(2.0 * 100.0 / fx, 0.05)
    tex_px = 4096
    span = max(per_row, rows * 2.5) * spacing + 2.5 * ground_w
    m = SyntheticMission(ref_dir, n_images=n_images,
                         img_size=(width, height), altitude=100.0,
                         spacing=spacing, fx=fx, rows=rows, seed=42,
                         texture_res=tex_res, texture_px=tex_px,
                         world_tiles=span > tex_px * tex_res * 0.9)
    regen = not os.path.isfile(os.path.join(ref_dir, "pix4d.csv"))
    m.generate(skip_existing=not regen)
    os.makedirs(ours_dir, exist_ok=True)
    for f in os.listdir(ref_dir):
        src = os.path.join(ref_dir, f)
        dst = os.path.join(ours_dir, f)
        if os.path.isfile(src) and not os.path.exists(dst):
            os.link(src, dst)
    db_dir = os.path.join(work, "cameras")
    camera_db.save("Synthetic_TestCam_none", m.camera_config(), db_dir)
    return m, ref_dir, ours_dir, db_dir


def write_flat_srtm_tiles(lat, lon, cache_dir="/var/tmp"):
    """Reference srtm.py:84-99 expects /var/tmp/<TILE>.hgt.zip with a
    1201x1201 big-endian int16 grid; write flat (elevation 0) tiles for
    the mission area so its Step-2 srtm.initialize needs no network."""
    flat = struct.pack(">1442401H", *([0] * 1442401))
    for la in (int(np.floor(lat)) - 1, int(np.floor(lat)),
               int(np.floor(lat)) + 1):
        for lo in (int(np.floor(lon)) - 1, int(np.floor(lon)),
                   int(np.floor(lon)) + 1):
            slat = f"S{-la:02d}" if la < 0 else f"N{la:02d}"
            slon = f"W{-lo:03d}" if lo < 0 else f"E{lo:03d}"
            name = slat + slon
            path = os.path.join(cache_dir, name + ".hgt.zip")
            if os.path.exists(path):
                continue
            with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as z:
                z.writestr(name + ".hgt", flat)


# --------------------------------------------------------------------------
# pipeline runs
# --------------------------------------------------------------------------

def run_reference(ref_dir, camera_json, log_path, strategy, filt,
                  scale, min_chain):
    env = dict(os.environ)
    env["PYTHONPATH"] = SHIMS
    env.pop("JAX_PLATFORMS", None)
    env.setdefault("MPLBACKEND", "Agg")
    cmd = [sys.executable, "process.py", ref_dir,
           "--camera", camera_json,
           "--match-strategy", strategy, "--filter", filt,
           "--scale", str(scale),
           "--min-chain-length", str(min_chain)]
    t0 = time.time()
    with open(log_path, "w") as logf:
        p = subprocess.run(cmd, cwd=REF_SCRIPTS, env=env, stdout=logf,
                           stderr=subprocess.STDOUT)
    return p.returncode, time.time() - t0


def run_ours(ours_dir, db_dir, log_path, strategy, filt, scale,
             min_chain, detector, platform="", worklist="sequential"):
    env = dict(os.environ)
    env["PYTHONPATH"] = f"{REPO}:/root/.axon_site"
    # compile events go to ours.log — the small-mission latency story
    # (VERDICT r4 missing #5) needs compile-vs-execute attribution
    env["JAX_LOG_COMPILES"] = "1"
    if platform:
        env["IMGTPU_PLATFORM"] = platform
    # worklist 'sequential' mirrors the reference's SHIPPED pair policy
    # (its distance window is dead code behind an 'if False',
    # matcher.py:896) so the pair-graph Jaccard compares like with like;
    # our default 'full' adds the distance window — a strict superset
    # (measured: all reference pairs ⊂ ours, extras GT-consistent)
    cmd = [sys.executable, "-m", "imageanalysis_tpu.apps.process",
           ours_dir, "--camera", "Synthetic_TestCam_none",
           "--camera-db", db_dir, "--scale", str(scale),
           "--match-strategy", strategy, "--filter", filt,
           "--min-chain-len", str(min_chain), "--detector", detector,
           "--worklist", worklist]
    t0 = time.time()
    with open(log_path, "w") as logf:
        p = subprocess.run(cmd, env=env, stdout=logf,
                           stderr=subprocess.STDOUT)
    return p.returncode, time.time() - t0


# --------------------------------------------------------------------------
# comparison
# --------------------------------------------------------------------------

def load_features_uv(analysis_dir):
    """cache/<base>.feat -> (n, 2) uv array. Handles both the reference's
    per-keypoint tuple list (image.py:192-208) and our IAFEATv2 array
    envelope (io/project.py save_features)."""
    out = {}
    cache = os.path.join(analysis_dir, "cache")
    for f in sorted(os.listdir(cache)):
        if not f.endswith(".feat"):
            continue
        with gzip.open(os.path.join(cache, f), "rb") as fh:
            kp = pickle.load(fh)
        if isinstance(kp, tuple) and len(kp) == 3 and kp[0] == "IAFEATv2":
            uv = np.asarray(kp[1], dtype=np.float64).reshape(-1, 2)
        else:
            uv = np.array([k[0] for k in kp], dtype=np.float64)
        out[f[:-5]] = uv
    return out


def load_match_graph(analysis_dir):
    """meta/<base>.match -> {(a, b): (idx_a, idx_b) arrays}, a < b."""
    meta = os.path.join(analysis_dir, "meta")
    graph = {}
    for f in sorted(os.listdir(meta)):
        if not f.endswith(".match"):
            continue
        a = f[:-6]
        with open(os.path.join(meta, f), "rb") as fh:
            ml = pickle.load(fh)
        for b, pairs in ml.items():
            b = os.path.splitext(b)[0]
            arr = np.asarray(pairs, dtype=np.int64).reshape(-1, 2)
            if a < b:
                graph.setdefault((a, b), arr)
            else:
                graph.setdefault((b, a), arr[:, ::-1])
    return graph


def gt_homographies(mission):
    """Per-image world-plane->image homography straight from the generator
    (SyntheticMission.world_to_image_H — the renderer's own map)."""
    return {os.path.splitext(name)[0]: mission.world_to_image_H(ned, ac_ypr)
            for name, ned, ac_ypr in mission.poses}


def gt_inlier_frac(graph, feats, Hs, tol_px):
    """Per-pair fraction of matches consistent with the GT pair homography
    (uv_a ~= H_a @ H_b^-1 @ uv_b on the flat synthetic ground)."""
    fracs = {}
    for (a, b), idx in graph.items():
        if a not in Hs or b not in Hs or not len(idx):
            continue
        H_ab = Hs[a] @ np.linalg.inv(Hs[b])
        uv_a = feats[a][idx[:, 0]]
        uv_b = feats[b][idx[:, 1]]
        ones = np.ones((len(uv_b), 1))
        pred = np.hstack([uv_b, ones]) @ H_ab.T
        pred = pred[:, :2] / pred[:, 2:3]
        err = np.linalg.norm(pred - uv_a, axis=1)
        fracs[(a, b)] = float((err < tol_px).mean())
    return fracs


def load_camera_cal(analysis_dir):
    with open(os.path.join(analysis_dir, "config.json")) as f:
        cfg = json.load(f)
    cam = cfg["camera"]
    K = np.array(cam.get("K_opt") or cam["K"], dtype=np.float64
                 ).reshape(3, 3)
    dist = np.array(cam.get("dist_coeffs_opt") or cam["dist_coeffs"],
                    dtype=np.float64)
    return K, dist


def load_opt_poses(analysis_dir):
    """meta/<base>.json -> {base: (ned(3), quat wxyz ned2cam)} using the
    optimized pose when valid (contract: reference image.py:462-521)."""
    poses = {}
    meta = os.path.join(analysis_dir, "meta")
    for f in sorted(os.listdir(meta)):
        if not f.endswith(".json"):
            continue
        with open(os.path.join(meta, f)) as fh:
            d = json.load(fh)
        node = d.get("camera_pose_opt")
        if not node or not node.get("valid", False):
            node = d.get("camera_pose")
        if not node:
            continue
        poses[f[:-5]] = (np.array(node["ned"], dtype=np.float64),
                         np.array(node["quat"], dtype=np.float64))
    return poses


def load_group0(analysis_dir, image_names):
    """groups.json group 0 → set of image INDICES (both sides' formats)."""
    try:
        with open(os.path.join(analysis_dir, "groups.json")) as f:
            g = json.load(f)
    except OSError:
        return None
    if not g:
        return None
    g0 = g[0]["images"] if isinstance(g[0], dict) else g[0]
    g0 = set(g0)
    base = [os.path.splitext(n)[0] for n in image_names]
    return {i for i, b in enumerate(base) if b in g0 or image_names[i] in g0}


def reprojection_rmse(analysis_dir, image_names, restrict_imgs=None,
                      min_chain=0):
    """One evaluator for both sides: project matches_grouped's optimized
    points through the optimized poses onto the raw observation uvs
    (reference optimizer.py:174-279 residual definition).

    restrict_imgs / min_chain scope the metric to the BA-ACTIVE set —
    group-0 observations of chains ≥ min-chain-length, the set step 4a
    actually optimizes and the scope of the reference's own reported mre
    (optimizer.py:249-252, 340). The unrestricted metric additionally
    includes short chains whose points were never re-optimized but whose
    cameras moved in BA — a stale-point artifact both pipelines share."""
    import cv2
    sys.path.insert(0, REPO)
    from imageanalysis_tpu.core.camera import ned_quat_to_rvec_tvec

    path = os.path.join(analysis_dir, "matches_grouped")
    with open(path, "rb") as f:
        matches = pickle.load(f)
    K, dist = load_camera_cal(analysis_dir)
    poses = load_opt_poses(analysis_dir)
    name_by_idx = [os.path.splitext(n)[0] for n in image_names]
    rvecs, tvecs = {}, {}
    for i, base in enumerate(name_by_idx):
        if base not in poses:
            continue
        ned, quat = poses[base]
        # the ned_quat→(R,t) chain including the camera mount
        # (reference image.py:542-553)
        rvec, tvec = ned_quat_to_rvec_tvec(ned, quat)
        rvecs[i] = np.asarray(rvec, np.float64).reshape(3, 1)
        tvecs[i] = np.asarray(tvec, np.float64).reshape(3, 1)
    errs = []
    obs_img = []
    obs_uv = []
    for m in matches:
        ned = m[0]
        if ned is None or len(m) - 2 < min_chain:
            continue
        pt = np.asarray(ned, dtype=np.float64).reshape(1, 3)
        for obs in m[2:]:
            i, uv = obs[0], obs[1]
            if i not in rvecs:
                continue
            if restrict_imgs is not None and i not in restrict_imgs:
                continue
            proj, _ = cv2.projectPoints(pt, rvecs[i], tvecs[i], K, dist)
            errs.append(np.linalg.norm(proj.ravel() - np.asarray(uv)))
            obs_img.append(i)
            obs_uv.append(np.asarray(uv, np.float64))
    errs = np.asarray(errs)
    per_obs = {"err": errs, "img": np.asarray(obs_img, np.int32),
               "uv": (np.asarray(obs_uv)
                      if obs_uv else np.zeros((0, 2)))}
    return (float(np.sqrt((errs ** 2).mean())), float(errs.mean()),
            float(errs.max()), int(len(errs)), per_obs)


def rmse_at_coverage(errs, n):
    """RMSE of the BEST n per-obs errors — 'what would this side's RMSE be
    if it had kept only as many observations as the other side, choosing
    optimally'. Controls the selection effect VERDICT r4 weak #4 flags:
    ours keeps fewer observations, so a plain RMSE win could reflect
    stricter filtering rather than better geometry. Comparing ours'
    full-set RMSE against the reference's best-n_ours subset removes that
    advantage entirely (maximally favorable to the reference)."""
    if len(errs) == 0 or n <= 0:
        return None
    best = np.sort(errs)[: min(n, len(errs))]
    return float(np.sqrt((best ** 2).mean()))


def common_obs_rmse(per_ref, per_ours, tol_px=2.0):
    """RMSE of both sides restricted to CORRESPONDING observations: same
    image and raw-uv within tol_px (keypoints come from different
    detectors, so correspondence is by proximity, not identity). Each
    ours-obs greedily claims its nearest unclaimed ref-obs."""
    from scipy.spatial import cKDTree

    sel_ref, sel_ours = [], []
    for img in np.unique(per_ours["img"]):
        mo = per_ours["img"] == img
        mr = per_ref["img"] == img
        if not mr.any():
            continue
        idx_r = np.nonzero(mr)[0]
        tree = cKDTree(per_ref["uv"][mr])
        d, j = tree.query(per_ours["uv"][mo], k=1,
                          distance_upper_bound=tol_px)
        ok = np.isfinite(d)
        # greedy de-dup: one ref obs matches at most one ours obs
        seen = set()
        for oi, (good, jj) in zip(np.nonzero(mo)[0], zip(ok, j)):
            if not good or jj in seen:
                continue
            seen.add(jj)
            sel_ours.append(oi)
            sel_ref.append(idx_r[jj])
    if not sel_ours:
        return None
    er = per_ref["err"][np.asarray(sel_ref)]
    eo = per_ours["err"][np.asarray(sel_ours)]
    return {"n_common": int(len(sel_ours)),
            "rmse_ref_px": round(float(np.sqrt((er ** 2).mean())), 4),
            "rmse_ours_px": round(float(np.sqrt((eo ** 2).mean())), 4),
            "tol_px": tol_px}


def chain_stats(analysis_dir):
    path = os.path.join(analysis_dir, "matches_grouped")
    with open(path, "rb") as f:
        matches = pickle.load(f)
    lens = np.array([len(m) - 2 for m in matches])
    return {"n_chains": int(len(matches)),
            "mean_len": round(float(lens.mean()), 3) if len(lens) else 0,
            "max_len": int(lens.max()) if len(lens) else 0}


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-images", type=int, default=20)
    ap.add_argument("--width", type=int, default=1024)
    ap.add_argument("--height", type=int, default=768)
    ap.add_argument("--rows", type=int, default=0,
                    help="grid rows (0 = auto, ~25 images/row)")
    ap.add_argument("--work", default="/tmp/parity_r5")
    ap.add_argument("--out", default="PARITY_r5.json")
    ap.add_argument("--strategy", default="traditional")
    ap.add_argument("--filter", default="homography")
    ap.add_argument("--scale", type=float, default=1.0)
    ap.add_argument("--min-chain-len", type=int, default=3)
    ap.add_argument("--detector", default="TPU",
                    help="our side's detector (TPU or SIFT=cv2)")
    ap.add_argument("--worklist", default="sequential",
                    choices=["full", "sequential"],
                    help="our side's pair policy; 'sequential' mirrors the "
                         "reference's shipped behavior (see run_ours)")
    ap.add_argument("--ours-platform", default="",
                    help="pin our side's jax backend (e.g. cpu) via "
                         "IMGTPU_PLATFORM")
    ap.add_argument("--skip-ref", action="store_true")
    ap.add_argument("--skip-ours", action="store_true")
    ap.add_argument("--tol-px", type=float, default=4.0)
    args = ap.parse_args(argv)

    os.makedirs(args.work, exist_ok=True)
    m, ref_dir, ours_dir, db_dir = make_mission(
        args.work, args.n_images, args.width, args.height, args.rows)
    from imageanalysis_tpu.testing.synthetic import REF_LLA
    write_flat_srtm_tiles(REF_LLA[0], REF_LLA[1])
    camera_json = os.path.join(db_dir, "Synthetic_TestCam_none.json")

    result = {"n_images": args.n_images,
              "image_size": [args.width, args.height],
              "strategy": args.strategy, "filter": args.filter,
              "scale": args.scale, "tol_px": args.tol_px,
              "ours_worklist": args.worklist}

    if not args.skip_ref:
        rc, wall = run_reference(ref_dir, camera_json,
                                 os.path.join(args.work, "ref.log"),
                                 args.strategy, args.filter, args.scale,
                                 args.min_chain_len)
        result["ref_rc"], result["ref_wall_s"] = rc, round(wall, 1)
        if rc != 0:
            print(json.dumps(result))
            print("reference pipeline failed; see", args.work + "/ref.log")
            return 1
    if not args.skip_ours:
        rc, wall = run_ours(ours_dir, db_dir,
                            os.path.join(args.work, "ours.log"),
                            args.strategy, args.filter, args.scale,
                            args.min_chain_len, args.detector,
                            platform=args.ours_platform,
                            worklist=args.worklist)
        result["ours_rc"], result["ours_wall_s"] = rc, round(wall, 1)
        if rc != 0:
            print(json.dumps(result))
            print("our pipeline failed; see", args.work + "/ours.log")
            return 1

    ref_ia = os.path.join(ref_dir, "ImageAnalysis")
    ours_ia = os.path.join(ours_dir, "ImageAnalysis")

    # --- match graph ------------------------------------------------------
    g_ref = load_match_graph(ref_ia)
    g_ours = load_match_graph(ours_ia)
    pr, po = set(g_ref), set(g_ours)
    inter = pr & po
    result["pairs_ref"] = len(pr)
    result["pairs_ours"] = len(po)
    result["pairs_common"] = len(inter)
    result["pair_jaccard"] = round(len(inter) / max(len(pr | po), 1), 4)
    result["pairs_ref_only"] = sorted(
        ["%s-%s" % p for p in (pr - po)])[:20]
    result["pairs_ours_only"] = sorted(
        ["%s-%s" % p for p in (po - pr)])[:20]
    cnt_ratio = [len(g_ours[p]) / max(len(g_ref[p]), 1) for p in inter]
    result["match_count_ratio_median"] = round(
        float(np.median(cnt_ratio)), 3) if cnt_ratio else None
    result["matches_total_ref"] = int(sum(len(v) for v in g_ref.values()))
    result["matches_total_ours"] = int(sum(len(v) for v in g_ours.values()))

    # --- geometric agreement vs ground truth ------------------------------
    f_ref = load_features_uv(ref_ia)
    f_ours = load_features_uv(ours_ia)
    Hs = gt_homographies(m)
    fr = gt_inlier_frac(g_ref, f_ref, Hs, args.tol_px)
    fo = gt_inlier_frac(g_ours, f_ours, Hs, args.tol_px)
    result["gt_inlier_frac_ref_median"] = round(
        float(np.median(list(fr.values()))), 4) if fr else None
    result["gt_inlier_frac_ours_median"] = round(
        float(np.median(list(fo.values()))), 4) if fo else None
    result["gt_inlier_frac_ref_min"] = round(
        float(np.min(list(fr.values()))), 4) if fr else None
    result["gt_inlier_frac_ours_min"] = round(
        float(np.min(list(fo.values()))), 4) if fo else None

    # --- chains ------------------------------------------------------------
    result["chains_ref"] = chain_stats(ref_ia)
    result["chains_ours"] = chain_stats(ours_ia)

    # --- BA / reprojection --------------------------------------------------
    image_names = sorted(n for n in os.listdir(ref_dir)
                         if n.lower().endswith(".jpg"))
    rmse_ref = reprojection_rmse(ref_ia, image_names)
    rmse_ours = reprojection_rmse(ours_ia, image_names)
    for tag, r in (("ref", rmse_ref), ("ours", rmse_ours)):
        result[f"rmse_{tag}_px"] = round(r[0], 4)
        result[f"mre_{tag}_px"] = round(r[1], 4)
        result[f"maxerr_{tag}_px"] = round(r[2], 3)
        result[f"n_obs_{tag}"] = r[3]

    # BA-active scope: group-0 observations of chains >= min-chain-length —
    # what step 4a optimizes and what the reference's own mre reports
    # (optimizer.py:249-252). The all-obs metric above also scores points
    # of never-optimized short chains under BA-moved cameras (both sides).
    ba_ref = reprojection_rmse(ref_ia, image_names,
                               restrict_imgs=load_group0(ref_ia,
                                                         image_names),
                               min_chain=max(args.min_chain_len, 3))
    ba_ours = reprojection_rmse(ours_ia, image_names,
                                restrict_imgs=load_group0(ours_ia,
                                                          image_names),
                                min_chain=max(args.min_chain_len, 3))
    for tag, r in (("ref", ba_ref), ("ours", ba_ours)):
        result[f"rmse_ba_active_{tag}_px"] = round(r[0], 4)
        result[f"maxerr_ba_active_{tag}_px"] = round(r[2], 3)
        result[f"n_obs_ba_active_{tag}"] = r[3]

    # observation-controlled comparisons (VERDICT r4 weak #4): the plain
    # RMSE gate is exposed to selection — ours keeps fewer observations
    v = rmse_at_coverage(ba_ref[4]["err"], ba_ours[3])
    result["rmse_ref_at_ours_coverage_px"] = (round(v, 4)
                                              if v is not None else None)
    result["rmse_common_obs"] = common_obs_rmse(rmse_ref[4], rmse_ours[4])
    result["rmse_common_obs_ba_active"] = common_obs_rmse(ba_ref[4],
                                                          ba_ours[4])

    # --- camera position error vs synthetic truth ---------------------------
    for tag, ia in (("ref", ref_ia), ("ours", ours_ia)):
        poses = load_opt_poses(ia)
        with open(os.path.join(ia, "config.json")) as f:
            cfg = json.load(f)
        ref_node = cfg.get("ned_reference", {})
        ref_lla = (ref_node.get("lat_deg"), ref_node.get("lon_deg"),
                   ref_node.get("alt_m"))
        true_ned = m.true_camera_ned(ref_lla)
        errs = []
        for i, (name, _, _) in enumerate(m.poses):
            base = os.path.splitext(name)[0]
            if base in poses:
                errs.append(np.linalg.norm(poses[base][0] - true_ned[i]))
        result[f"cam_err_mean_m_{tag}"] = round(float(np.mean(errs)), 4)
        result[f"cam_err_max_m_{tag}"] = round(float(np.max(errs)), 4)

    # --- the BASELINE.md gate ------------------------------------------------
    # gate on the BA-active scope (the optimizer's output, like for like);
    # the all-obs RMSEs stay reported above
    result["gate_rmse_ours_le_ref"] = bool(
        result["rmse_ba_active_ours_px"]
        <= result["rmse_ba_active_ref_px"] + 1e-6)
    # selection-controlled variant (VERDICT r4 weak #4): compare on
    # CORRESPONDING observations — same image, raw uv within 2 px — so a
    # win can't come from one side keeping fewer/easier observations.
    # (rmse_ref_at_ours_coverage_px stays reported: as an order-statistic
    # trim it over-flatters whichever side has more observations.)
    co = result["rmse_common_obs_ba_active"]
    result["gate_rmse_obs_controlled"] = bool(
        co is not None
        and co["rmse_ours_px"] <= co["rmse_ref_px"] + 1e-6)
    result["gate_pair_graph"] = bool(result["pair_jaccard"] >= 0.75)
    both = [result["gt_inlier_frac_ours_median"],
            result["gt_inlier_frac_ref_median"]]
    result["gate_geometry"] = bool(
        None not in both and both[0] >= both[1] - 0.02)

    with open(args.out, "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result, indent=2))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
