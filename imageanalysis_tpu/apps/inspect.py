"""QA inspection tools — the reference's 3e-show/review script family.

Non-interactive equivalents (this environment is headless; the reference
pops cv2 windows): each subcommand writes annotated PNGs or prints reports.

- ``features <image>``   — draw detected keypoints (3e-show-features.py)
- ``pair <img1> <img2>`` — side-by-side match visualization with inlier
                           lines (3e-show-match-pairs.py / find_obj.py)
- ``groups``             — group membership/connectivity report
                           (3e-show-image-groups.py)
- ``matches``            — chain-length histogram + per-image match counts
                           (3e-review-matches.py flavor)
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

from ..io.logger import log


def _proj(path):
    from ..io.project import ProjectMgr

    p = ProjectMgr(path)
    p.load_images_info()
    return p


def cmd_features(args):
    import cv2

    proj = _proj(args.project)
    im = proj.image_by_name(args.image)
    if im is None:
        log("unknown image:", args.image)
        return 1
    im.load_features()
    img = cv2.imread(proj.image_path(im))
    for (x, y), (size, *_), in zip(im.kp, im.kp_meta):
        cv2.circle(img, (int(x), int(y)), max(int(size / 2), 2),
                   (0, 255, 0), 1)
    out = args.out or f"{args.image}-features.png"
    cv2.imwrite(out, img)
    log(f"{len(im.kp)} features → {out}")
    return 0


def cmd_pair(args):
    import cv2

    proj = _proj(args.project)
    i1 = proj.image_by_name(args.image1)
    i2 = proj.image_by_name(args.image2)
    i1.load_features()
    i2.load_features()
    i1.load_matches()
    pairs = i1.match_list.get(i2.name, [])
    img1 = cv2.imread(proj.image_path(i1))
    img2 = cv2.imread(proj.image_path(i2))
    h = max(img1.shape[0], img2.shape[0])
    canvas = np.zeros((h, img1.shape[1] + img2.shape[1], 3), np.uint8)
    canvas[:img1.shape[0], :img1.shape[1]] = img1
    canvas[:img2.shape[0], img1.shape[1]:] = img2
    off = img1.shape[1]
    for a, b in pairs[:: max(len(pairs) // 200, 1)]:
        p1 = tuple(int(v) for v in i1.kp[a])
        p2 = (int(i2.kp[b][0]) + off, int(i2.kp[b][1]))
        cv2.line(canvas, p1, p2, (0, 255, 0), 1)
        cv2.circle(canvas, p1, 3, (0, 0, 255), -1)
        cv2.circle(canvas, p2, 3, (0, 0, 255), -1)
    out = args.out or f"{args.image1}-vs-{args.image2}.png"
    cv2.imwrite(out, canvas)
    log(f"{len(pairs)} matches → {out}")
    return 0


def cmd_groups(args):
    from ..match import groups as groups_mod

    proj = _proj(args.project)
    grps = groups_mod.load(proj.analysis_dir)
    if not grps:
        log("no groups.json")
        return 1
    placed = set()
    for gi, g in enumerate(grps):
        log(f"group {gi}: {len(g)} images")
        for name in g:
            log("  ", name)
        placed.update(g)
    missing = [im.name for im in proj.image_list if im.name not in placed]
    if missing:
        log(f"unplaced images ({len(missing)}):", ", ".join(missing))
    return 0


def cmd_matches(args):
    proj = _proj(args.project)
    matches = proj.load_matches_grouped()
    lens = np.array([len(m) - 2 for m in matches])
    log(f"{len(matches)} chains, {lens.sum()} observations")
    for k in range(2, min(lens.max() + 1, 12)):
        log(f"  chains of length {k}: {(lens == k).sum()}")
    counts = {}
    for m in matches:
        for img, _ in m[2:]:
            counts[img] = counts.get(img, 0) + 1
    log("per-image observation counts:")
    for img in sorted(counts):
        log(f"  {proj.image_list[img].name}: {counts[img]}")
    return 0


def main(argv=None):
    p = argparse.ArgumentParser(prog="imageanalysis-inspect")
    sub = p.add_subparsers(dest="cmd", required=True)
    s = sub.add_parser("features")
    s.add_argument("project")
    s.add_argument("image")
    s.add_argument("--out")
    s.set_defaults(fn=cmd_features)
    s = sub.add_parser("pair")
    s.add_argument("project")
    s.add_argument("image1")
    s.add_argument("image2")
    s.add_argument("--out")
    s.set_defaults(fn=cmd_pair)
    s = sub.add_parser("groups")
    s.add_argument("project")
    s.set_defaults(fn=cmd_groups)
    s = sub.add_parser("matches")
    s.add_argument("project")
    s.set_defaults(fn=cmd_matches)
    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
