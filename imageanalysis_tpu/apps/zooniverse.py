"""Zooniverse crowd-sourcing tile tools.

Reference 3rd_party/zooniverse/*.py: chop large mission images into
web-sized overlapping tiles for crowd annotation, then paste user marks
(tile pixel coords) back through the tile → image → ground projection to
lat/lon.

``chop``  — write tiles + a tiles.csv manifest (image, tile, x0, y0)
``paste`` — tile-space marks csv → annotations.json/csv/kml via each
            image's optimized pose and the project surface
"""

from __future__ import annotations

import argparse
import csv
import os
import sys

import numpy as np

from ..io.logger import log


def chop(project_dir, out_dir, tile=512, overlap=64, max_images=None):
    import cv2

    from ..io.project import ProjectMgr

    proj = ProjectMgr(project_dir)
    proj.load_images_info()
    os.makedirs(out_dir, exist_ok=True)
    manifest = []
    for im in proj.image_list[:max_images]:
        img = cv2.imread(proj.image_path(im))
        h, w = img.shape[:2]
        step = tile - overlap
        ys = sorted({min(y0, max(h - tile, 0))
                     for y0 in range(0, max(h - overlap, 1), step)})
        xs = sorted({min(x0, max(w - tile, 0))
                     for x0 in range(0, max(w - overlap, 1), step)})
        for y0 in ys:
            for x0 in xs:
                crop = img[y0:y0 + tile, x0:x0 + tile]
                name = f"{im.name}_t{y0:05d}_{x0:05d}.jpg"
                cv2.imwrite(os.path.join(out_dir, name), crop,
                            [cv2.IMWRITE_JPEG_QUALITY, 90])
                manifest.append([name, im.name, x0, y0])
    with open(os.path.join(out_dir, "tiles.csv"), "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["tile", "image", "x0", "y0"])
        w.writerows(manifest)
    log(f"chopped {len(manifest)} tiles → {out_dir}")
    return manifest


def paste(project_dir, marks_csv, tiles_csv, ground=0.0):
    """marks_csv rows: tile, u, v[, comment] (tile-pixel coords) →
    project annotations at the ground intersection."""
    import jax.numpy as jnp

    from ..core.camera import pixel_vectors_ned, undistort_pixels, \
        intersect_ground_plane
    from ..core.rotations import quat_to_matrix
    from ..io.project import ProjectMgr
    from ..render.annotations import Annotations

    proj = ProjectMgr(project_dir)
    proj.load_images_info()
    model = proj.camera_model(optimized=True)
    tiles = {}
    with open(tiles_csv) as f:
        for row in csv.DictReader(f):
            tiles[row["tile"]] = (row["image"], int(row["x0"]), int(row["y0"]))

    ann = Annotations(proj.analysis_dir, proj.ned_reference_lla()).load()
    n_added = 0
    with open(marks_csv) as f:
        for row in csv.DictReader(f):
            tile = row["tile"]
            if tile not in tiles:
                continue
            image_name, x0, y0 = tiles[tile]
            im = proj.image_by_name(image_name)
            if im is None:
                continue
            uv = np.array([[float(row["u"]) + x0, float(row["v"]) + y0]],
                          np.float32)
            und = undistort_pixels(jnp.asarray(uv), model.K, model.dist)
            ned, _, quat = im.get_camera_pose(opt=im.has_opt_pose())
            b2n = quat_to_matrix(jnp.asarray(quat, dtype=jnp.float32))
            vec = pixel_vectors_ned(und, b2n, model.K)
            hit = np.asarray(intersect_ground_plane(
                jnp.asarray(ned, dtype=jnp.float32), ground, vec))[0]
            ann.add_marker_ned(hit.tolist(), row.get("comment", ""))
            n_added += 1
    ann.save()
    log(f"pasted {n_added} marks into annotations")
    return n_added


def main(argv=None):
    p = argparse.ArgumentParser(prog="imageanalysis-zooniverse")
    sub = p.add_subparsers(dest="cmd", required=True)
    s = sub.add_parser("chop")
    s.add_argument("project")
    s.add_argument("out_dir")
    s.add_argument("--tile", type=int, default=512)
    s.add_argument("--overlap", type=int, default=64)
    s.set_defaults(fn=lambda a: (chop(a.project, a.out_dir, a.tile,
                                      a.overlap), 0)[1])
    s = sub.add_parser("paste")
    s.add_argument("project")
    s.add_argument("marks_csv")
    s.add_argument("tiles_csv")
    s.add_argument("--ground", type=float, default=0.0)
    s.set_defaults(fn=lambda a: (paste(a.project, a.marks_csv, a.tiles_csv,
                                       a.ground), 0)[1])
    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
