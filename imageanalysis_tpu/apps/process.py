"""End-to-end pipeline driver — the reference's ``process.py`` (L8).

Same stage flow and state gating (reference process.py:108-420):

  Step 1   project creation + camera config            (state STEP1)
  Step 2   poses + NED reference + terrain priors      (state STEP2)
  Step 3a  feature detection + pair matching           (state STEP3a)
  Step 3b  match cleanup + chain linking               (state STEP3b)
  Step 3c  initial triangulation                       (state STEP3c)
  Step 3d  image grouping                              (state STEP3d)
  Step 4   bundle adjustment + refit                   (state STEP4)
  Step 5   surface/render outputs                      (state STEP5)

Usage: ``python -m imageanalysis_tpu.apps.process <image_dir> [options]``.
Any stage can be redone with ``--refresh STEPn``.
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np


def build_parser():
    p = argparse.ArgumentParser(description="TPU-native aerial survey pipeline")
    p.add_argument("project", help="directory with geotagged images")
    p.add_argument("--camera", help="camera config key (cameras/<key>.json)")
    p.add_argument("--camera-db", action="append", default=[],
                   help="extra camera DB directory")
    p.add_argument("--yaw-deg", type=float, default=0.0, help="camera mount yaw")
    p.add_argument("--pitch-deg", type=float, default=-90.0, help="camera mount pitch")
    p.add_argument("--roll-deg", type=float, default=0.0, help="camera mount roll")
    p.add_argument("--max-angle", type=float, default=25.0,
                   help="max pose roll/pitch angle")
    p.add_argument("--force-altitude", type=float)
    p.add_argument("--force-heading", type=float)
    p.add_argument("--yaw-from-groundtrack", action="store_true")
    p.add_argument("--detector", default="SIFT", choices=["SIFT", "ORB", "TPU"])
    p.add_argument("--scale", type=float, default=0.4, help="detection image scale")
    p.add_argument("--max-features", type=int, default=0)
    p.add_argument("--match-strategy", default="traditional",
                   choices=["traditional", "smart", "bestratio", "bruteforce"])
    p.add_argument("--match-ratio", type=float, default=0.75)
    p.add_argument("--filter", default="homography",
                   choices=["homography", "fundamental", "essential",
                            "essential5", "none"])
    p.add_argument("--min-chain-len", type=int, default=3)
    p.add_argument("--worklist", default="full",
                   choices=["full", "sequential"],
                   help="pair work-list policy: 'full' = distance window + "
                        "sequential neighbors (the reference's documented "
                        "policy, matcher.py:858-916); 'sequential' = "
                        "neighbors |i-j|<=4 only (the reference's SHIPPED "
                        "behavior — its distance branch is disabled by an "
                        "'if False', matcher.py:896)")
    p.add_argument("--ground", type=float,
                   help="flat ground elevation (m MSL) instead of SRTM")
    p.add_argument("--group", type=int, default=0, help="group index to optimize")
    p.add_argument("--refine", action="store_true",
                   help="start BA from previously optimized poses")
    p.add_argument("--cam-calibration", action="store_true",
                   help="include global camera calibration in BA")
    p.add_argument("--refresh", action="append", default=[],
                   help="redo a stage (STEP1..STEP5)")
    p.add_argument("--batch-size", type=int, default=16)
    p.add_argument("--geotiff", action="store_true",
                   help="also composite an orthomosaic GeoTIFF in Step 5")
    p.add_argument("--geotiff-res", type=float, default=0.25,
                   help="orthomosaic resolution (m/px)")
    p.add_argument("--histogram", action="store_true",
                   help="build neighborhood histogram-matching tables in "
                        "Step 5 (explorer applies them at texture load)")
    p.add_argument("--trace", metavar="DIR",
                   help="capture a JAX profiler trace of the whole pipeline "
                        "run into DIR (open with TensorBoard / xprof)")
    return p


def run(args) -> int:
    if args.trace:
        import jax

        with jax.profiler.trace(args.trace):
            rc = _run(args)
        from ..io.logger import log
        log(f"JAX profiler trace written to {args.trace}")
        return rc
    return _run(args)


def _run(args) -> int:
    # multi-host bootstrap before any backend touch: with
    # JAX_COORDINATOR/JAX_NUM_PROCESSES/JAX_PROCESS_ID (or TPU pod
    # metadata) set, the same command runs the pipeline across hosts —
    # host-side setup/graph stages on rank 0, detection + matching sharded
    # over processes, BA on the global device mesh
    from ..parallel import multihost
    multi = multihost.maybe_initialize_distributed()

    from ..io import camera_db, pose as pose_mod
    from ..io.logger import log
    from ..io.project import ProjectMgr

    rank0 = not multi or multihost.is_rank0()

    # per-stage wall clocks in the run log (the reference logs per-stage
    # metrics too, SURVEY.md §5 metrics/logging); parseable as
    # "stage wall: <name> <s>s" — scripts_dev/small_mission_decompose.py
    # uses these to attribute small-mission latency
    import time as _time
    _t0 = _time.perf_counter()
    _tprev = [_t0]

    def _mark(name):
        now = _time.perf_counter()
        log(f"stage wall: {name} {now - _tprev[0]:.2f}s")
        _tprev[0] = now

    proj = ProjectMgr(args.project, create=True)
    if rank0:
        for step in args.refresh:
            proj.state.clear(step)
    if multi:
        multihost.barrier("refresh")

    # ---- Step 1: camera config (reference process.py:108-166) -----------
    if not rank0:
        pass  # rank 0 writes config/poses; reload after the barrier below
    elif not proj.state.check("STEP1"):
        log("Step 1: setting up camera config")
        cam_key = args.camera or proj.detect_camera()
        cfg = camera_db.load(cam_key, db_dirs=args.camera_db) if cam_key else None
        if cfg is None:
            files = proj.image_files()
            if not files:
                log("no images found in", args.project)
                return 1
            log("camera not in DB, estimating from EXIF:", cam_key)
            cfg = camera_db.estimate_from_exif(
                os.path.join(args.project, files[0]))
        cfg["mount"] = {"yaw_deg": args.yaw_deg, "pitch_deg": args.pitch_deg,
                        "roll_deg": args.roll_deg}
        # a zero focal length (EXIF-less images + no DB entry) would NaN
        # every undistorted coordinate and surface only as "0 matches"
        # thousands of images later — fail here with the cause instead
        K = cfg.get("K") or []
        if len(K) < 5 or not (float(K[0]) > 0.0 and float(K[4]) > 0.0):
            log(f"camera '{cam_key}' has no usable focal length "
                f"(fx={K[0] if len(K) else 'missing'}) — images carry no "
                "EXIF FocalLength and the camera is not in the DB; pass "
                "--camera <key> (with --camera-db) or add the camera with "
                "'utils new-camera'")
            return 1
        proj.set_camera_config(cfg)
        proj.save()
        proj.state.update("STEP1")

    _mark("step1_setup")

    # ---- Step 2: poses (reference process.py:170-229) -------------------
    if not rank0:
        pass
    elif not proj.state.check("STEP2"):
        log("Step 2: setting aircraft/camera poses")
        pix4d = os.path.join(args.project, "pix4d.csv")
        meta_txt = os.path.join(args.project, "image-metadata.txt")
        if os.path.exists(pix4d):
            pose_mod.set_aircraft_poses(proj, pix4d, order="rpy",
                                        max_angle=args.max_angle)
        elif os.path.exists(meta_txt):
            pose_mod.set_aircraft_poses(proj, meta_txt, order="ypr",
                                        max_angle=args.max_angle)
        else:
            log("No pose file found, generating pix4d.csv from image EXIF")
            pose_mod.make_pix4d(args.project,
                                camera_make=proj.camera.get("make", ""),
                                camera_model=proj.camera.get("model", ""),
                                force_altitude=args.force_altitude,
                                force_heading=args.force_heading,
                                yaw_from_groundtrack=args.yaw_from_groundtrack)
            pose_mod.set_aircraft_poses(proj, pix4d, order="rpy",
                                        max_angle=args.max_angle)
        proj.load_images_info()
        proj.compute_ned_reference_lla()
        pose_mod.compute_camera_poses(proj)
        # terrain elevation prior under each camera (reference process.py:218
        # srtm.initialize + smart.update_srtm_elevations)
        from ..match.smart import SmartState
        from ..surface import srtm as srtm_mod
        terrain = srtm_mod.project_terrain(
            proj, fallback_elev=args.ground if args.ground is not None else None)
        smart_state = SmartState(proj.analysis_dir)
        smart_state.update_srtm_elevations(proj, terrain)
        smart_state.save()
        proj.save()
        proj.state.update("STEP2")
    else:
        proj.load_images_info()
    if multi:
        multihost.barrier("steps12")
        if not rank0:
            # pick up rank 0's config.json + meta written above
            proj = ProjectMgr(args.project, create=True)
            proj.load_images_info()

    _mark("step2_poses")

    # ---- Step 3a: detection + matching (process.py:236-301) -------------
    from ..features.detect import DetectorConfig, detect_project_features
    from ..match import cleanup, groups as groups_mod
    from ..match.matcher import MatchConfig, find_matches

    # multi-rank stage gates: rank 0 evaluates the STEP marker once and
    # broadcasts, so every rank takes the same branch (independent FS reads
    # can disagree under NFS attribute-cache lag → mismatched barrier
    # sequences → hang)
    def gate(step):
        done = proj.state.check(step)
        return multihost.agree(done, step) if multi else done

    if not gate("STEP3a"):
        log("Step 3a: feature detection + pair matching")
        det_cfg = DetectorConfig(
            detector="SIFT" if args.detector == "TPU" else args.detector,
            scale=args.scale, max_features=args.max_features,
            backend="tpu" if args.detector == "TPU" else "cv")
        proj.config.node("detector").update(det_cfg.to_dict())
        detect_project_features(proj, det_cfg)
        _mark("step3a_detect")
        mcfg = MatchConfig(strategy=args.match_strategy, ratio=args.match_ratio,
                           transform=args.filter, batch_size=args.batch_size)
        proj.config.node("matcher").set("min_chain_len", args.min_chain_len)
        from ..match.smart import SmartState
        smart_state = SmartState(proj.analysis_dir)
        find_matches(proj, mcfg, smart_state=smart_state,
                     use_distance=args.worklist == "full")
        _mark("step3a_match")
        if rank0:
            if args.match_strategy == "smart":
                # apply the accumulated yaw-error estimates to the poses
                # (reference smart.set_yaw_error_estimates, smart.py:341-346)
                body2cam = proj.get_body2cam()
                n_fix = 0
                for im in proj.image_list:
                    err = smart_state.get_yaw_error(im.name)
                    if abs(err) > 0.5:
                        im.set_aircraft_yaw_error_estimate(err, body2cam)
                        im.save_meta()
                        n_fix += 1
                if n_fix:
                    log(f"applied yaw-error corrections to {n_fix} images")
            # bad-geometry rejection with the final poses (reference
            # matcher.py:996-1005) — on the merged match files
            from ..match import smart as smart_mod
            smart_mod.requalify_pairs(proj, smart_state)
            proj.save()
            proj.state.update("STEP3a")
        if multi:
            multihost.barrier("step3a")
            if not rank0:
                proj.load_images_info()

    _mark("step3a_finish")

    # ---- Step 3b: cleanup + linking (process.py:305-319) ----------------
    # host-side graph stages (3b/3c/3d) run on rank 0; other ranks wait at
    # the pre-BA barrier below and read the results from the shared FS.
    # `matches` is carried in memory across 3b→3c→3d→4 — the pickled chain
    # structure is millions of entries at mission scale, and reloading it
    # between consecutive stages cost tens of seconds of pure IO (saves
    # stay: they are the resume checkpoints).
    matches = None
    if not rank0:
        pass
    elif not proj.state.check("STEP3b"):
        log("Step 3b: linking matches into chains")
        for im in proj.image_list:
            if im.kp is None:
                im.load_features()
            if not im.match_list:
                im.load_matches()
        matches = cleanup.link_matches(proj)
        proj.save_matches_grouped(matches)
        proj.state.update("STEP3b")

    _mark("step3b_link")

    # ---- Step 3c: initial triangulation (process.py:321-333) ------------
    if not rank0:
        pass
    elif not proj.state.check("STEP3c"):
        log("Step 3c: initial triangulation")
        if matches is None:
            matches = proj.load_matches_grouped()
        if args.ground is not None:
            base = lambda image: args.ground
        else:
            from ..match.smart import SmartState
            from ..surface import srtm
            terrain = srtm.project_terrain(proj)
            smart_state = SmartState(proj.analysis_dir)
            # prefer the triangulated smart surface, fall back to SRTM
            # (reference match_cleanup.py:310-321)

            def base(image, _s=smart_state, _t=terrain):
                n = _s.node(image.name)
                if "tri_surface_m" in n:
                    return n["tri_surface_m"]
                return _t.base_elevation(image)
        cleanup.triangulate_ground(proj, matches, get_base_elev=base)
        proj.save_matches_grouped(matches)
        proj.state.update("STEP3c")

    _mark("step3c_triangulate")

    # ---- Step 3d: grouping (process.py:335-363) -------------------------
    if not rank0:
        pass
    elif not proj.state.check("STEP3d"):
        log("Step 3d: connectivity grouping")
        if matches is None:
            matches = proj.load_matches_grouped()
        grps = groups_mod.compute(proj.image_list, matches,
                                  min_chain_len=args.min_chain_len)
        groups_mod.save(proj.analysis_dir, grps)
        proj.save_matches_grouped(matches)
        log("Groups:", [len(g) for g in grps])
        proj.state.update("STEP3d")

    if multi:
        multihost.barrier("steps3bcd")

    _mark("step3d_groups")

    # ---- Step 4: bundle adjustment (process.py:366-407) -----------------
    if not gate("STEP4"):
        log("Step 4: sparse bundle adjustment")
        from ..ba import bundle, setup as ba_setup

        if matches is None or not rank0:
            matches = proj.load_matches_grouped()
        grps = groups_mod.load(proj.analysis_dir)
        group_images = grps[args.group] if grps else None
        cams0, pts0, obs, cam_names, match_map = ba_setup.setup_from_matches(
            proj, matches, group_images=group_images,
            min_chain_len=args.min_chain_len, optimized=args.refine)
        if len(cam_names) < 2 or len(pts0) == 0:
            log(f"Not enough structure to optimize ({len(cam_names)} cameras,"
                f" {len(pts0)} points) — check matching stage output")
            return 1
        model = proj.camera_model()
        if args.cam_calibration:
            # calibration's bordered Schur system is rank-0-local; other
            # ranks just wait at the step-4 barrier below
            if not rank0:
                result = None
            else:
                from ..ba import calibrate
                result, K_opt, dist_opt = calibrate.solve_with_calibration(
                    cams0, pts0, obs, model.K, model.dist, log_fn=log)
                # persist as K_opt / dist_coeffs_opt (camera.py:78-113)
                proj.camera.setlist("K_opt", np.asarray(K_opt).ravel())
                proj.camera.setlist("dist_coeffs_opt", dist_opt)
                proj.save()
        elif multi:
            # every rank executes the same sharded solve over the global
            # mesh: the Schur reductions psum over ICI + DCN
            from ..parallel import sharded
            result = sharded.solve_sharded(
                cams0, pts0, obs, model.K, model.dist,
                multihost.global_mesh(), bundle.BAConfig(),
                verbose=rank0, log_fn=log)
        else:
            result = bundle.solve(cams0, pts0, obs, model.K, model.dist,
                                  bundle.BAConfig(), log_fn=log)
        # re-register onto the GPS solution (reference optimizer.py:583-683)
        if result is not None:
            new_cams, new_pts, _ = bundle.refit(result.cams, result.pts,
                                                cams0[:, :3])
            result = result._replace(cams=new_cams, pts=new_pts)
        if rank0:
            ba_setup.write_back(proj, matches, result, cam_names, match_map)
            # refresh the chains BA did NOT optimize (short chains +
            # other groups) against the OPTIMIZED poses: BA leaves gauge
            # drift along weakly-constrained modes (roll about a
            # single-strip track), and points derived from the pre-BA
            # poses then reproject arbitrarily badly under the new ones
            # (12.5 px RMSE measured on group-0 2-chains). The reference
            # ships with this artifact (its stale 2-chains measure
            # 1.3 px); re-deriving is the fix its structure never had.
            active = set(int(mi) for mi in match_map)
            by_name = {im.name: i for i, im in enumerate(proj.image_list)}
            opt_imgs = {by_name[n] for n in cam_names if n in by_name}
            stale = [mi for mi, mm in enumerate(matches)
                     if mi not in active
                     and any(o[0] in opt_imgs for o in mm[2:])]
            if stale:
                from ..match.smart import SmartState
                from ..surface import srtm
                terrain = srtm.project_terrain(proj)
                s_state = SmartState(proj.analysis_dir)

                def base4(image, _s=s_state, _t=terrain):
                    n = _s.node(image.name)
                    if "tri_surface_m" in n:
                        return n["tri_surface_m"]
                    return _t.base_elevation(image)
                cleanup.triangulate_ground(proj, matches,
                                           get_base_elev=base4,
                                           subset=stale, optimized=True)
            proj.save_matches_grouped(matches)
            log(f"BA finished: mre={result.mre:.3f}px over "
                f"{len(cam_names)} cameras")
            proj.state.update("STEP4")
        if multi:
            multihost.barrier("step4")
            if not rank0:
                # pick up rank 0's optimized poses for the render stage
                proj.load_images_info()

    _mark("step4_ba")

    # ---- Step 5: render (process.py:411-420) ----------------------------
    step5_todo = not gate("STEP5")
    if step5_todo:
        if rank0:
            log("Step 5: building surface/render outputs")
        from ..render import build_map
        grps = groups_mod.load(proj.analysis_dir)
        matches = proj.load_matches_grouped()
        if multi:
            # per-image eggs/textures shard across ranks (disjoint files);
            # rank 0 also writes surface.bin + the AC3D models
            group = (grps[args.group] if grps
                     else [im.name for im in proj.image_list])
            mine = multihost.process_shard(sorted(group))
            build_map.build(proj, matches, grps, group_index=args.group,
                            only_images=mine, global_outputs=rank0)
            multihost.barrier("step5_render")
        else:
            build_map.build(proj, matches, grps, group_index=args.group)
    if not rank0:
        pass
    elif step5_todo:
        if args.histogram:
            from ..render.texture import build_histograms
            build_histograms(proj)
            log("histogram-matching tables built (explorer applies them "
                "at texture load)")
        if args.geotiff:
            from ..render import geotiff
            group_imgs = grps[args.group] if grps else None
            geotiff.build_geotiff(proj, group_imgs,
                                  resolution=args.geotiff_res,
                                  ground=args.ground or 0.0)
        proj.state.update("STEP5")
    if multi:
        multihost.barrier("step5")
    _mark("step5_render")
    log(f"stage wall: TOTAL {_time.perf_counter() - _t0:.2f}s")
    log("Pipeline complete.")
    return 0


def main(argv=None):
    # IMGTPU_PLATFORM=cpu pins jax to a backend before first use — needed
    # because some TPU plugins (axon) ignore the JAX_PLATFORMS env var;
    # lets the CLI run host-only when the accelerator is absent or flaky
    plat = os.environ.get("IMGTPU_PLATFORM")
    if plat:
        import jax
        jax.config.update("jax_platforms", plat)
    args = build_parser().parse_args(argv)
    return run(args)


if __name__ == "__main__":
    sys.exit(main())
