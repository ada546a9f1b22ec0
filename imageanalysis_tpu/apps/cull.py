"""Outlier culling tools — the reference's 4b/4c script family.

- ``mre`` — recompute reprojection residuals with the optimized solution,
  report per-image mean/max error, delete observations with |error| >
  mre + nσ (default n=5) or an absolute cap (reference 4b-mre-by-image.py).
- ``colocated`` — delete feature chains whose view rays are all nearly
  colinear (max pairwise angle < 1°): they destabilize the solver
  (reference 4b-colocated-feats.py, scripts/README.md:208-217).
- ``remove-image`` — drop all observations referencing one image
  (reference 4b-remove-camera-matches.py).

Deleting an observation drops the whole chain when fewer than
``min_chain_len`` observations remain (reference match_culling.py:115-131);
``--strong`` drops the whole chain for any marked observation.

Usage: ``python -m imageanalysis_tpu.apps.cull <project> mre --stddev 5``.
After culling, rerun Step 4 (``process --refresh STEP4 --refine``).
"""

from __future__ import annotations

import argparse
import sys

import numpy as np

from ..io.logger import log


def compute_errors(proj, matches, optimized=True):
    """Per-observation reprojection |error| (px) — the reference's
    ``opt.fun(x0)`` recompute (4b-mre-by-image.py:52-60).

    Returns (errors (n_obs,), obs_index list of (match_idx, obs_slot)).
    """
    import jax.numpy as jnp

    from ..core.camera import project_ned_quat

    model = proj.camera_model(optimized=optimized)
    n_img = len(proj.image_list)
    cam_ned = np.zeros((n_img, 3), np.float32)
    cam_quat = np.zeros((n_img, 4), np.float32)
    for i, im in enumerate(proj.image_list):
        use_opt = optimized and im.has_opt_pose()
        ned, _, quat = im.get_camera_pose(opt=use_opt)
        cam_ned[i] = ned
        cam_quat[i] = quat

    obs_img, obs_uv, obs_pt, index = [], [], [], []
    for mi, match in enumerate(matches):
        if match[0] is None:
            continue
        for slot, (img, uv) in enumerate(match[2:]):
            obs_img.append(img)
            obs_uv.append(uv)
            obs_pt.append(match[0])
            index.append((mi, slot))
    if not index:
        return np.zeros(0), []
    obs_img = np.asarray(obs_img, np.int32)
    pred, _ = project_ned_quat(jnp.asarray(np.asarray(obs_pt, np.float32)),
                               jnp.asarray(cam_ned)[obs_img],
                               jnp.asarray(cam_quat)[obs_img],
                               model.K, model.dist)
    err = np.linalg.norm(np.asarray(pred) - np.asarray(obs_uv, np.float32),
                         axis=1)
    return err, index


def report_by_image(proj, errors, index, matches):
    stats = {}
    for e, (mi, slot) in zip(errors, index):
        img = matches[mi][2 + slot][0]
        stats.setdefault(img, []).append(e)
    rows = []
    for img, es in sorted(stats.items(), key=lambda kv: -np.mean(kv[1])):
        rows.append((proj.image_list[img].name, float(np.mean(es)),
                     float(np.max(es)), len(es)))
    log("%-24s %8s %8s %8s" % ("image", "mean", "max", "count"))
    for name, mean, mx, n in rows:
        log("%-24s %8.3f %8.2f %8d" % (name, mean, mx, n))
    return rows


def mark_outliers(errors, index, stddev=5.0, max_error=None):
    """Observations with error > mre + n·σ (reference 4b:117-150)."""
    if len(errors) == 0:
        return []
    mre = float(np.mean(errors))
    std = float(np.std(errors))
    thresh = max_error if max_error is not None else mre + stddev * std
    marked = [index[i] for i in np.nonzero(errors > thresh)[0]]
    log(f"mre={mre:.3f}px std={std:.3f} threshold={thresh:.2f}px "
        f"→ {len(marked)} observations marked")
    return marked


def delete_marked(matches, marked, min_chain_len=3, strong=False):
    """Remove marked observations; drop depleted chains
    (reference match_culling.py:115-131)."""
    by_match = {}
    for mi, slot in marked:
        by_match.setdefault(mi, set()).add(slot)
    new_matches = []
    dropped_chains = dropped_obs = 0
    for mi, match in enumerate(matches):
        if mi not in by_match:
            new_matches.append(match)
            continue
        if strong:
            dropped_chains += 1
            continue
        obs = [o for slot, o in enumerate(match[2:])
               if slot not in by_match[mi]]
        dropped_obs += len(match[2:]) - len(obs)
        if len(obs) >= min_chain_len:
            new_matches.append(match[:2] + obs)
        else:
            dropped_chains += 1
    log(f"deleted {dropped_obs} observations, {dropped_chains} whole chains; "
        f"{len(new_matches)} chains remain")
    return new_matches


def mark_colocated(proj, matches, min_angle_deg=1.0, optimized=True):
    """Chains whose observation rays are nearly parallel (reference
    4b-colocated-feats.py): triangulation is unstable, remove entirely."""
    from ..core.rotations import quat_to_matrix

    n_img = len(proj.image_list)
    cam_ned = np.zeros((n_img, 3))
    for i, im in enumerate(proj.image_list):
        use_opt = optimized and im.has_opt_pose()
        ned, _, _ = im.get_camera_pose(opt=use_opt)
        cam_ned[i] = ned
    cos_min = np.cos(np.radians(min_angle_deg))
    marked = []
    for mi, match in enumerate(matches):
        if match[0] is None:
            continue
        p = np.asarray(match[0])
        rays = []
        for img, _ in match[2:]:
            v = p - cam_ned[img]
            n = np.linalg.norm(v)
            if n > 1e-6:
                rays.append(v / n)
        if len(rays) < 2:
            continue
        R = np.asarray(rays)
        cosangles = R @ R.T
        iu = np.triu_indices(len(rays), k=1)
        if np.all(cosangles[iu] > cos_min):
            marked.append(mi)
    log(f"{len(marked)} chains with max ray angle < {min_angle_deg}°")
    return marked


def remove_camera_matches(matches, image_idx, min_chain_len=3):
    """Drop all observations of one image (reference
    4b-remove-camera-matches.py)."""
    new_matches = []
    for match in matches:
        obs = [o for o in match[2:] if o[0] != image_idx]
        if len(obs) >= min_chain_len:
            new_matches.append(match[:2] + obs)
    return new_matches


def main(argv=None):
    p = argparse.ArgumentParser(description="reprojection-error culling tools")
    p.add_argument("project")
    sub = p.add_subparsers(dest="cmd", required=True)
    p_mre = sub.add_parser("mre", help="cull by reprojection error")
    p_mre.add_argument("--stddev", type=float, default=5.0)
    p_mre.add_argument("--max", type=float, help="absolute error cap (px)")
    p_mre.add_argument("--strong", action="store_true",
                       help="drop whole chains, not just observations")
    p_mre.add_argument("--dry-run", action="store_true")
    p_col = sub.add_parser("colocated", help="cull near-parallel-ray chains")
    p_col.add_argument("--min-angle", type=float, default=1.0)
    p_col.add_argument("--dry-run", action="store_true")
    p_rm = sub.add_parser("remove-image", help="drop one image's matches")
    p_rm.add_argument("name")
    args = p.parse_args(argv)

    from ..io.project import ProjectMgr

    proj = ProjectMgr(args.project)
    proj.load_images_info()
    matches = proj.load_matches_grouped()

    if args.cmd == "mre":
        errors, index = compute_errors(proj, matches)
        report_by_image(proj, errors, index, matches)
        marked = mark_outliers(errors, index, stddev=args.stddev,
                               max_error=args.max)
        if not args.dry_run and marked:
            matches = delete_marked(matches, marked, strong=args.strong)
            proj.save_matches_grouped(matches)
            proj.state.clear("STEP4")
            log("matches_grouped updated; rerun Step 4 with --refine")
    elif args.cmd == "colocated":
        marked_chains = mark_colocated(proj, matches,
                                       min_angle_deg=args.min_angle)
        if not args.dry_run and marked_chains:
            keep = set(range(len(matches))) - set(marked_chains)
            matches = [matches[i] for i in sorted(keep)]
            proj.save_matches_grouped(matches)
            proj.state.clear("STEP4")
    elif args.cmd == "remove-image":
        idx = None
        for i, im in enumerate(proj.image_list):
            if im.name == args.name:
                idx = i
        if idx is None:
            log("unknown image:", args.name)
            return 1
        matches = remove_camera_matches(matches, idx)
        proj.save_matches_grouped(matches)
        proj.state.clear("STEP4")
    return 0


if __name__ == "__main__":
    sys.exit(main())
