"""Step 5 map build: surface.bin + textures + .egg models.

Reference render_panda3d.py:80-244 ``build_map`` + panda3d.py:24-144:

1. collect the group's optimized 3D points, discard >10σ elevation outliers;
2. dump ``models/surface.bin`` = pickle {points: [[e, n], ...], values:
   [down, ...]} (consumed by the explorer's Surface);
3. Delaunay-triangulate the points and build a linear interpolator
   (host scipy — output-side geometry, not a hot loop);
4. for each image: project an (steps+1)² uv grid through the optimized
   camera pose, iteratively intersect each ray with the interpolated
   surface (grazing rays < ~30° off-horizon become NaN and are skipped,
   reference render_panda3d.py:25-71), redistort the grid for texture uv;
5. write 512² INTER_AREA textures + dummy.jpg and the per-image .egg mesh
   (Z-Up, x=east y=north z=up — reference panda3d.py:77-144).

The ray math runs batched on device (one call for all images' grids); the
iterative surface walk stays on host because the interpolator is scipy.
"""

from __future__ import annotations

import os
import pickle

import numpy as np

from ..io.logger import log

GRID_STEPS = 8
TEXTURE_RES = 512


def intersect_surface(interp, cam_ned, vectors, avg_ground, iters=10):
    """Iteratively walk each ray onto the Delaunay surface (reference
    render_panda3d.py:25-71 intersect2d). cam_ned: (3,) or (n, 3) per-ray
    camera centers — the batched form lets ALL images' grids walk the
    surface in one vectorized pass (one scipy interp call per iteration
    over every ray instead of one per image). vectors: (n, 3) NED. Rays
    more than ~60° from straight down (i.e. <30° above horizon) give NaN."""
    cam_ned = np.asarray(cam_ned, dtype=float)
    if cam_ned.ndim == 1:
        cam_ned = cam_ned[None, :]
    n = vectors.shape[0]
    cam_z = cam_ned[:, 2] if cam_ned.shape[0] > 1 else cam_ned[0, 2]
    ground = np.full(n, avg_ground, dtype=float)  # down-coordinate
    v = vectors
    ok = v[:, 2] > 0.5  # cos(60°): reject grazing/horizon rays
    for _ in range(iters):
        d_proj = -(cam_z + ground)
        factor = np.where(ok, d_proj / np.where(ok, v[:, 2], 1.0), 0.0)
        p = cam_ned + v * factor[:, None]
        z = interp(p[:, [1, 0]])  # interp takes [e, n]
        new_ground = np.where(np.isnan(z), ground, z)
        if np.nanmax(np.abs(new_ground - ground)) < 0.01:
            ground = new_ground
            break
        ground = new_ground
    d_proj = -(cam_z + ground)
    factor = np.where(ok, d_proj / np.where(ok, v[:, 2], 1.0), np.nan)
    pts = cam_ned + v * factor[:, None]
    pts[~ok] = np.nan
    return pts


def decimate_surface(points_en, values, target=50_000):
    """Grid-bin a dense surface point cloud to ~target cell-mean points.

    A 2812-image mission triangulates >1M surface points; Delaunay +
    LinearNDInterpolator over them cost minutes of host time (and the
    surface files hundreds of MB) for a terrain model the 8×8 ray grids and
    the explorer sample at ~meter scale anyway. Cell means keep the terrain
    statistics; the raw convex-hull vertices are appended so the
    interpolation domain (and thus edge-of-map ray coverage) does not
    shrink. Returns (points (m, 2), values (m,)) — the input unchanged when
    already under target."""
    points_en = np.asarray(points_en, float)
    values = np.asarray(values, float)
    n = len(points_en)
    if n <= target:
        return points_en, values
    lo = points_en.min(axis=0)
    span = np.maximum(points_en.max(axis=0) - lo, 1e-6)
    cell = float(np.sqrt(span[0] * span[1] / target))
    ij = np.floor((points_en - lo) / cell).astype(np.int64)
    nx = int(ij[:, 0].max()) + 1
    key = ij[:, 1] * nx + ij[:, 0]
    uniq, inv = np.unique(key, return_inverse=True)
    cnt = np.bincount(inv)
    ce = np.bincount(inv, weights=points_en[:, 0]) / cnt
    cn = np.bincount(inv, weights=points_en[:, 1]) / cnt
    cv = np.bincount(inv, weights=values) / cnt
    out_pts = np.stack([ce, cn], axis=1)
    out_val = cv
    try:
        import scipy.spatial
        hull = scipy.spatial.ConvexHull(points_en).vertices
        out_pts = np.concatenate([out_pts, points_en[hull]])
        out_val = np.concatenate([out_val, values[hull]])
    except Exception:
        pass
    log(f"Surface decimated {n} -> {len(out_pts)} points "
        f"(cell {cell:.1f} m means + hull)")
    return out_pts, out_val


def make_textures(proj, image_list, resolution=TEXTURE_RES):
    """512² INTER_AREA downsampled textures + dummy.jpg (reference
    panda3d.py:24-74)."""
    import cv2

    dst_dir = proj.models_dir
    os.makedirs(dst_dir, exist_ok=True)
    first_src = None
    for image in image_list:
        src_path = proj.image_path(image)
        if first_src is None:
            first_src = src_path
        dst = os.path.join(dst_dir, image.name + ".JPG")
        if os.path.exists(dst):
            continue
        # decode at reduced resolution when it still oversamples the
        # texture: libjpeg's DCT-domain scaling makes REDUCED_COLOR_2/4
        # ~3-10× faster than a full decode, and the INTER_AREA downsample
        # to `resolution` sees ≥1 source px per output px either way
        w0, h0 = image.get_size()
        if not w0 or not h0:
            w0 = int(proj.camera.get("width_px", 0))
            h0 = int(proj.camera.get("height_px", 0))
        flags = (cv2.IMREAD_ANYCOLOR | cv2.IMREAD_ANYDEPTH
                 | cv2.IMREAD_IGNORE_ORIENTATION)
        if min(w0, h0) >= 4 * resolution:
            flags |= cv2.IMREAD_REDUCED_COLOR_4
        elif min(w0, h0) >= 2 * resolution:
            flags |= cv2.IMREAD_REDUCED_COLOR_2
        src = cv2.imread(src_path, flags=flags)
        h, w = src.shape[:2]
        tex = cv2.resize(src, (0, 0), fx=resolution / float(w),
                         fy=resolution / float(h), interpolation=cv2.INTER_AREA)
        cv2.imwrite(dst, tex)
    dummy = os.path.join(dst_dir, "dummy.jpg")
    if first_src and not os.path.exists(dummy):
        src = cv2.imread(first_src)
        h, w = src.shape[:2]
        cv2.imwrite(dummy, cv2.resize(src, (0, 0), fx=64.0 / w, fy=64.0 / h,
                                      interpolation=cv2.INTER_AREA))


def write_egg(path, grid_xyz, distorted_uv, width, height, steps):
    """Panda3d .egg mesh: grid quads, skipping NaN vertices (reference
    panda3d.py:87-144). grid_xyz in [east, north, up]."""
    lines = ["<CoordinateSystem> { Z-Up }", "",
             '<Texture> tex { "dummy.jpg" }', "", "<VertexPool> surface {"]
    nan_set = set()
    n = 1
    for j in range(steps + 1):
        for i in range(steps + 1):
            v = grid_xyz[n - 1]
            if np.any(np.isnan(v)):
                v = [0.0, 0.0, 0.0]
                nan_set.add(j * (steps + 1) + i + 1)
            uv = distorted_uv[n - 1]
            lines.append("  <Vertex> %d {" % n)
            lines.append("    %.2f %.2f %.2f" % (v[0], v[1], v[2]))
            lines.append("    <UV> { %.5f %.5f }" % (uv[0] / float(width),
                                                     1.0 - uv[1] / float(height)))
            lines.append("  }")
            n += 1
    lines += ["}", "", "<Group> surface {"]
    count = 0
    for j in range(steps):
        for i in range(steps):
            c = j * (steps + 1) + i + 1
            d = (j + 1) * (steps + 1) + i + 1
            if {c, d, c + 1, d + 1} & nan_set:
                continue
            lines.append("  <Polygon> {")
            lines.append("   <TRef> { tex }")
            lines.append("   <Normal> { 0 0 1 }")
            lines.append("   <VertexRef> { %d %d %d %d <Ref> { surface } }"
                         % (d, d + 1, c + 1, c))
            lines.append("  }")
            count += 1
    lines.append("}")
    if count == 0:
        return 0
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")
    return count


def build(proj, matches, groups, group_index=0, ground=None,
          grid_steps=GRID_STEPS, texture_resolution=TEXTURE_RES,
          only_images=None, global_outputs=True):
    """only_images / global_outputs support multi-host rendering: each rank
    writes the per-image eggs/textures of its image shard (disjoint files on
    the shared FS) and only rank 0 emits surface.bin / AC3D outputs."""
    import jax
    import jax.numpy as jnp
    import scipy.interpolate
    import scipy.spatial

    from ..core.camera import pixel_vectors_ned, redistort_pixels
    from ..core.rotations import quat_to_matrix

    group = groups[group_index] if groups else [im.name for im in proj.image_list]
    group_set = set(group)

    # ---- elevation stats + surface.bin ----------------------------------
    pts = np.array([m[0] for m in matches
                    if m[1] == group_index and m[0] is not None])
    if len(pts) < 3:
        # ungrouped mini-missions: take every triangulated match
        pts = np.array([m[0] for m in matches if m[0] is not None])
    if len(pts) < 3:
        log("build_map: not enough points to build a surface")
        return None
    avg = -np.mean(pts[:, 2])
    std = max(np.std(pts[:, 2]), 1e-6)
    keep = np.abs(-pts[:, 2] - avg) < 10 * std
    log("Average elevation: %.2f  stddev: %.2f  (%d/%d points kept)"
        % (avg, std, keep.sum(), len(pts)))
    raw_points = pts[keep][:, [1, 0]]          # [e, n]
    raw_values = pts[keep][:, 2]               # down
    # mission-scale surfaces decimate to cell means before triangulation:
    # Delaunay + LinearNDInterpolator over >1M raw points cost minutes of
    # host time for a terrain model sampled at 8×8 grids per image
    raw_points, raw_values = decimate_surface(raw_points, raw_values)
    os.makedirs(proj.models_dir, exist_ok=True)
    if global_outputs:
        with open(os.path.join(proj.models_dir, "surface.bin"), "wb") as f:
            pickle.dump({"points": raw_points.tolist(),
                         "values": raw_values.tolist()}, f)

    tri = scipy.spatial.Delaunay(raw_points)
    interp = scipy.interpolate.LinearNDInterpolator(tri, raw_values)

    # ---- per-image grid projection --------------------------------------
    model = proj.camera_model(optimized=True)
    width = int(proj.camera.get("width_px", 0))
    height = int(proj.camera.get("height_px", 0))
    u = np.linspace(0, width, grid_steps + 1)
    v = np.linspace(0, height, grid_steps + 1)
    UU, VV = np.meshgrid(u, v)                 # row-major: v outer, u inner
    grid_uv = np.stack([UU.ravel(), VV.ravel()], axis=1).astype(np.float32)

    group_images = [im for im in proj.image_list if im.name in group_set]
    write_set = (group_set if only_images is None
                 else group_set & set(only_images))
    if not global_outputs:
        # per-image writes only: skip the grid math for other ranks' images
        group_images = [im for im in group_images if im.name in write_set]
    made = []
    grids = {}
    dist_uvs = {}

    # ONE device call for every image's ray grid (a per-image dispatch +
    # download costs a serialized ~34 ms tunnel RTT each — at mission scale
    # the old per-image loop spent minutes on pure round-trip latency), and
    # the redistorted texture uv grid is pose-independent: compute it once.
    neds = np.zeros((len(group_images), 3), np.float32)
    quats = np.zeros((len(group_images), 4), np.float32)
    for i, image in enumerate(group_images):
        ned, _, quat = image.get_camera_pose(opt=image.has_opt_pose())
        neds[i] = np.asarray(ned, np.float32)
        quats[i] = np.asarray(quat, np.float32)
    guv = jnp.asarray(grid_uv)
    vecs_all = np.asarray(jax.jit(jax.vmap(
        lambda q: pixel_vectors_ned(guv, quat_to_matrix(q), model.K)
    ))(jnp.asarray(quats))) if group_images else np.zeros((0, 0, 3))
    dist_uv = np.asarray(redistort_pixels(guv, model.K, model.dist))

    # batched surface walk: all rays of all images in one vectorized pass
    G = grid_uv.shape[0]
    cams_flat = np.repeat(neds.astype(float), G, axis=0)
    pts_flat = intersect_surface(
        interp, cams_flat, vecs_all.reshape(-1, 3),
        avg_ground=(-avg if ground is None else -ground)) \
        if group_images else np.zeros((0, 3))
    pts_all = pts_flat.reshape(len(group_images), G, 3)

    for i, image in enumerate(group_images):
        pts_ned = pts_all[i]
        grid_xyz = np.stack([pts_ned[:, 1], pts_ned[:, 0], -pts_ned[:, 2]],
                            axis=1)           # [e, n, up]
        grids[image.name] = grid_xyz
        dist_uvs[image.name] = dist_uv
        if image.name not in write_set:
            continue
        egg_path = os.path.join(proj.models_dir, image.name + ".egg")
        count = write_egg(egg_path, grid_xyz, dist_uv, width, height, grid_steps)
        if count:
            made.append(image.name)
        else:
            log("Warning: no polygons fully on surface:", image.name)

    make_textures(proj, [im for im in group_images if im.name in write_set],
                  resolution=texture_resolution)

    if global_outputs:
        # AC3D outputs (reference 5b-delaunay5.py surface + ac3d.py model)
        from . import ac3d
        ac3d.write_surface_ac(os.path.join(proj.models_dir,
                                           "surface-global.ac"),
                              raw_points, raw_values)
        ac3d.generate_textured(proj, [im.name for im in group_images], grids,
                               dist_uvs)
    log(f"build_map: wrote {len(made)} egg models + textures to {proj.models_dir}")
    return made
