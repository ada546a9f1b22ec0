"""Project utilities — the reference's 99-* script family.

Subcommands:

- ``new-camera``    — estimate a camera config from an image's EXIF and add
                      it to a camera DB dir (reference 99-new-camera.py:1-122)
- ``vignette``      — build the average-image vignette mask from a mission's
                      images (reference 99-vignette.py): median-downsampled
                      mean image, radially fit, saved as vignette.png for
                      the explorer's texture correction
- ``merge``         — merge several project folders into a group project
                      (reference 99-create-group-project.py): union of image
                      metadata and caches via symlinks + merged pose files
- ``zip``           — archive the ImageAnalysis meta (without caches) for
                      sharing (reference 99-zip-project.py)
- ``calibrate``     — chessboard camera calibration from images or a movie
                      (reference 3rd_party/ltseez-opencv/calibrate*.py)
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import zipfile

import numpy as np

from ..io.logger import log


def cmd_new_camera(args):
    from ..io import camera_db

    cfg = camera_db.estimate_from_exif(args.image, ccd_width_mm=args.ccd_width)
    key = f"{cfg['make']}_{cfg['model']}_{cfg['lens_model']}".replace(" ", "_")
    camera_db.save(key, cfg, args.db)
    log("wrote camera config:", os.path.join(args.db, key + ".json"))
    print(json.dumps(cfg, indent=2))
    return 0


def cmd_vignette(args):
    import cv2

    files = sorted(f for f in os.listdir(args.project)
                   if f.lower().endswith((".jpg", ".jpeg")))
    if not files:
        log("no images found")
        return 1
    acc = None
    count = 0
    for fname in files[: args.max_images]:
        img = cv2.imread(os.path.join(args.project, fname))
        g = cv2.cvtColor(img, cv2.COLOR_BGR2GRAY).astype(np.float64)
        acc = g if acc is None else acc + g
        count += 1
    mean = acc / count
    mean = cv2.GaussianBlur(mean, (0, 0), mean.shape[1] / 32.0)
    # radial fit: average by radius, normalized to center
    h, w = mean.shape
    yy, xx = np.mgrid[0:h, 0:w]
    r = np.hypot(yy - h / 2, xx - w / 2)
    r_norm = r / r.max()
    nbins = 64
    idx = np.minimum((r_norm * nbins).astype(int), nbins - 1)
    prof = np.bincount(idx.ravel(), mean.ravel(), nbins) / \
        np.maximum(np.bincount(idx.ravel(), minlength=nbins), 1)
    prof = prof / prof[0]
    vig = prof[idx]
    out = os.path.join(args.project, "ImageAnalysis", "vignette.png")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    cv2.imwrite(out, (np.clip(vig, 0.2, 1.0) * 255).astype(np.uint8))
    log(f"vignette mask from {count} images → {out} "
        f"(corner falloff {prof[-1]:.2f})")
    return 0


def cmd_merge(args):
    """Union several missions into one group project via symlinked images
    and concatenated pix4d files."""
    os.makedirs(args.out, exist_ok=True)
    rows = []
    header = None
    for src in args.projects:
        pix4d = os.path.join(src, "pix4d.csv")
        with open(pix4d) as f:
            lines = f.read().splitlines()
        if header is None:
            header = lines[0]
        for ln in lines[1:]:
            if not ln.strip():
                continue
            name = ln.split(",")[0]
            link = os.path.join(args.out, name)
            target = os.path.abspath(os.path.join(src, name))
            if not os.path.exists(link):
                os.symlink(target, link)
            rows.append(ln)
    with open(os.path.join(args.out, "pix4d.csv"), "w") as f:
        f.write(header + "\n" + "\n".join(rows) + "\n")
    log(f"merged {len(args.projects)} projects, {len(rows)} images → {args.out}")
    return 0


def cmd_zip(args):
    ia = os.path.join(args.project, "ImageAnalysis")
    out = args.out or (os.path.basename(os.path.abspath(args.project))
                       + "-analysis.zip")
    n = 0
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        for root, dirs, files in os.walk(ia):
            if os.path.basename(root) == "cache" and not args.include_cache:
                dirs[:] = []
                continue
            for fname in files:
                p = os.path.join(root, fname)
                z.write(p, os.path.relpath(p, args.project))
                n += 1
    log(f"zipped {n} files → {out}")
    return 0


def cmd_calibrate(args):
    """Chessboard calibration (reference 3rd_party/ltseez-opencv)."""
    import cv2

    pattern = tuple(int(v) for v in args.pattern.split("x"))
    objp = np.zeros((pattern[0] * pattern[1], 3), np.float32)
    objp[:, :2] = np.mgrid[0:pattern[0], 0:pattern[1]].T.reshape(-1, 2) \
        * args.square_mm
    objpoints, imgpoints = [], []
    shape = None

    def feed(gray):
        nonlocal shape
        shape = gray.shape[::-1]
        found, corners = cv2.findChessboardCorners(gray, pattern)
        if found:
            corners = cv2.cornerSubPix(
                gray, corners, (5, 5), (-1, -1),
                (cv2.TERM_CRITERIA_EPS + cv2.TERM_CRITERIA_MAX_ITER, 30, 0.01))
            objpoints.append(objp)
            imgpoints.append(corners)

    if args.movie:
        cap = cv2.VideoCapture(args.movie)
        idx = 0
        while True:
            ret, fr = cap.read()
            if not ret:
                break
            if idx % args.frame_step == 0:
                feed(cv2.cvtColor(fr, cv2.COLOR_BGR2GRAY))
            idx += 1
        cap.release()
    else:
        for f in sorted(os.listdir(args.images)):
            if f.lower().endswith((".jpg", ".jpeg", ".png")):
                img = cv2.imread(os.path.join(args.images, f),
                                 cv2.IMREAD_GRAYSCALE)
                feed(img)
    if len(objpoints) < 5:
        log(f"only {len(objpoints)} usable chessboard views; need ≥5")
        return 1
    rms, K, dist, _, _ = cv2.calibrateCamera(objpoints, imgpoints, shape,
                                             None, None)
    log(f"calibration rms: {rms:.3f}px over {len(objpoints)} views")
    cfg = {
        "make": args.make, "model": args.model, "lens_model": "unknown",
        "K": K.ravel().tolist(), "dist_coeffs": dist.ravel()[:5].tolist(),
        "width_px": shape[0], "height_px": shape[1],
        "focal_len_mm": 0.0, "ccd_width_mm": 0.0, "ccd_height_mm": 0.0,
    }
    if args.db:
        from ..io import camera_db
        key = f"{args.make}_{args.model}".replace(" ", "_")
        camera_db.save(key, cfg, args.db)
        log("saved to camera DB:", key)
    print(json.dumps(cfg, indent=2))
    return 0


def cmd_histogram(args):
    """Build + persist the neighborhood histogram-matching tables consumed
    by the explorer at texture load (reference lib/histogram.py +
    explorer.py:79)."""
    from ..io.project import ProjectMgr
    from ..render.texture import build_histograms

    proj = ProjectMgr(args.project)
    proj.load_images_info()
    hists, templates = build_histograms(proj, dist_cutoff=args.dist,
                                        self_weight=args.self_weight)
    print(f"histogram tables for {len(templates)} images saved to "
          f"{proj.analysis_dir}/histogram.pickle")
    return 0


def main(argv=None):
    p = argparse.ArgumentParser(prog="imageanalysis-utils")
    sub = p.add_subparsers(dest="cmd", required=True)

    s = sub.add_parser("histogram",
                       help="build explorer histogram-matching tables")
    s.add_argument("project")
    s.add_argument("--dist", type=float, default=40.0)
    s.add_argument("--self-weight", type=float, default=0.1)
    s.set_defaults(fn=cmd_histogram)

    s = sub.add_parser("new-camera")
    s.add_argument("image")
    s.add_argument("--db", required=True)
    s.add_argument("--ccd-width", type=float)
    s.set_defaults(fn=cmd_new_camera)

    s = sub.add_parser("vignette")
    s.add_argument("project")
    s.add_argument("--max-images", type=int, default=100)
    s.set_defaults(fn=cmd_vignette)

    s = sub.add_parser("merge")
    s.add_argument("out")
    s.add_argument("projects", nargs="+")
    s.set_defaults(fn=cmd_merge)

    s = sub.add_parser("zip")
    s.add_argument("project")
    s.add_argument("--out")
    s.add_argument("--include-cache", action="store_true")
    s.set_defaults(fn=cmd_zip)

    s = sub.add_parser("calibrate")
    s.add_argument("--images")
    s.add_argument("--movie")
    s.add_argument("--pattern", default="9x6")
    s.add_argument("--square-mm", type=float, default=25.0)
    s.add_argument("--make", default="unknown")
    s.add_argument("--model", default="unknown")
    s.add_argument("--db")
    s.add_argument("--frame-step", type=int, default=30)
    s.set_defaults(fn=cmd_calibrate)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
